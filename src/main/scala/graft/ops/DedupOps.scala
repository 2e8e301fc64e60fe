package graft.ops

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Near-duplicate detection over `documents` (training-data dedup surface):
  *   - exact dedup            → TextOps.q34/q35 (hash groupBy)
  *   - n-gram Jaccard          → q39 (explode + shingle equi-join)
  *   - MinHash + LSH banding   → q40 (signatures via min-of-hash aggs,
  *                               band-bucket join for candidate pairs)
  *   - SimHash                 → q41 (bitwise majority of token hashes)
  *
  * MinHash/SimHash use xxhash64 (engine-specific), so those two are
  * verified by ScalaTest specs with planted near-duplicates rather than
  * the SQL oracle; Jaccard is pure integer math and oracle-checked.
  */
object DedupOps {
  type Q = (SparkSession, String) => DataFrame

  private val words: Column = split(col("text"), " ")

  /** Distinct word 3-gram shingles of `text`. */
  def shingles3(c: Column): Column = {
    val ws = split(c, " ")
    val n = size(ws)
    array_distinct(when(n >= 3,
      transform(sequence(lit(1), n - 2), i =>
        concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
          element_at(ws, i + 2)))).otherwise(array()))
  }

  // ---------------------------------------------------------------- q39
  /** Exact n-gram Jaccard near-dup pairs. Shape: explode distinct shingles,
    * shuffle on the shingle (the only wide op), count intersections per
    * pair, join per-doc sizes back. Scales as Σ shingle-frequency² — safe
    * when shingles are near-unique; hot shingles would be dropped by a
    * document-frequency cap in a production run. */
  val q39JaccardPairs: Q = (spark, dir) => {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), shingles3(col("text")).as("sh"))
    val sizes = d.select(col("doc_id"), size(col("sh")).as("n"))
    val ex = d.select(col("doc_id"), explode(col("sh")).as("s"))
    val pairs = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")))
      .filter(col("inter") >= 2)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q39Oracle: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(ws) >= 3 THEN
      |    list_transform(range(1, len(ws) - 1),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |    ELSE [] END)) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, inter,
      | inter * 1.0 / (na.n + nb.n - inter) AS jaccard
      |FROM p JOIN sz na ON na.doc_id = doc_a JOIN sz nb ON nb.doc_id = doc_b
      |WHERE inter >= 2 ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------ MinHash
  /** MinHash signature: for seed i, sig_i = min over shingles of
    * xxhash64(shingle, seed_i). Computed with transform+aggregate inside
    * codegen (array_min over hashed shingles) — one narrow pass. */
  def minhashSignature(sh: Column, nHashes: Int): Column =
    transform(sequence(lit(0), lit(nHashes - 1)), seed =>
      array_min(transform(sh, s => xxhash64(s, seed))))

  /** LSH banding: split the signature into bands of `r` rows; band hash =
    * xxhash64 of the band slice. Docs sharing any band hash are candidate
    * near-dup pairs (then verified with exact Jaccard). */
  def lshCandidates(docsWithSh: DataFrame, nHashes: Int, bands: Int): DataFrame = {
    val r = nHashes / bands
    val sig = minhashSignature(col("sh"), nHashes)
    val banded = docsWithSh
      .filter(size(col("sh")) > 0)
      .withColumn("sig", sig)
      .select(col("doc_id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(slice(col("sig"), b * r + 1, lit(r))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
  }

  // ---------------------------------------------------------------- q40
  /** MinHash-LSH near-dup candidates with exact-Jaccard verification.
    * 32 hashes, 8 bands of 4 → catches pairs with J ≳ 0.5. Rows-only
    * check in the harness (hash function is engine-specific); planted
    * duplicate behavior is pinned by DedupSpec. */
  val q40MinHashLsh: Q = (spark, dir) => {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), shingles3(col("text")).as("sh"))
    lshCandidates(d, nHashes = 32, bands = 8)
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------- q41
  /** SimHash-64: per token hash, each bit votes ±1; the sign of the vote
    * sum forms the fingerprint bit. Near-dups have small Hamming distance.
    * Output: doc_id, fingerprint, and hamming distance to the previous doc
    * (a cheap non-trivial derived column). */
  val q41SimHash: Q = (spark, dir) => {
    val tokens = array_distinct(words)
    val hashes = transform(tokens, t => xxhash64(t))
    val simhash = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), simhash.as("simhash"))
      .withColumn("bits_set", bit_count(col("simhash")).cast("long"))
      .orderBy(col("doc_id"))
  }

  val all: ListMap[String, Q] = ListMap(
    "q39_jaccard_pairs" -> q39JaccardPairs,
    "q40_minhash_lsh" -> q40MinHashLsh,
    "q41_simhash" -> q41SimHash,
  )

  /** q40/q41 use xxhash64 → no SQL oracle; spec-tested instead. */
  val oracles: ListMap[String, String] = ListMap(
    "q39_jaccard_pairs" -> q39Oracle,
  )
}
