package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Smoke: every declared query runs at sf0.001 and yields a sane result.
  * Deep value checking is the DuckDB oracle harness (tools/oracle_check.py
  * + the driver's CORRECTNESS gate). */
class QueriesSmokeSpec extends SparkSpec {
  graft.SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      // q39/q40 candidate pairs can legitimately be empty on tiny data
      val n = df.count()
      if (!Set("q39_jaccard_pairs", "q40_minhash_lsh",
          "q51_winnow_pairs").contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = graft.SparkEntry.queries.keySet
    val missing = graft.SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}

/** Behavior pins for the engine-hash-specific dedup ops (no SQL oracle):
  * planted near-duplicates must be found. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("q157 ExactSubstr: planted cross-doc span covered exactly; " +
      "candidate set bounded by true duplicated anchors, not corpus²") {
    val shared = (1 to 10).map(i => s"S$i")
    val docs = Seq(
      (0L, ((1 to 5).map(i => s"u$i") ++ shared ++
        (6 to 10).map(i => s"u$i")).mkString(" ")),
      (1L, ((1 to 5).map(i => s"v$i") ++ shared ++
        (6 to 10).map(i => s"v$i")).mkString(" ")),
      (2L, (1 to 25).map(i => s"c$i").mkString(" ")), // no overlap
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("q157spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // Bound pin: the 10-token shared span holds exactly 10-K+1 = 3
    // duplicated 8-token windows per doc → 6 candidate anchors. The
    // corpus has 3×18 = 54 anchors; a broken prune (corpus² shape)
    // would surface all of them here.
    val cand = DedupOps.exactSubstrCandidates(
      DedupOps.exactSubstrToks(spark, dir))
    assert(cand.count() == 6L)
    // Coverage: union of the three 8-windows = the full 10-token span
    // of each 20-token doc (5 unique + 10 shared + 5 unique).
    val got = DedupOps.q157ExactSubstr(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toList
    assert(got == List((0L, 20L, 10L, 0.5), (1L, 20L, 10L, 0.5)),
      s"got $got")
  }

  test("q158 CBO: column stats + joinReorder move the selective dim " +
      "innermost despite adversarial syntax order; cbo off keeps " +
      "syntax order") {
    def leafOrder(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val leaves = df.queryExecution.optimizedPlan.collectLeaves()
        .map(_.toString)
      Seq("part", "supplier", "nation").sortBy(t =>
        leaves.indexWhere(_.contains(s"graft_cbo_$t")))
    }
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevReorder = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    val reordered = Relational.q158CboStar(spark, sf)
    try {
      assert(leafOrder(reordered).head == "part",
        s"CBO should join the brand-filtered part dim first, " +
          s"got ${leafOrder(reordered)}")
      // causality: same query with cbo off keeps the written order
      // (part LAST) — the reorder is the stats-driven optimizer's doing.
      // q158CboStar scopes its own flags (restores on exit), so the
      // off-contrast just sets them off here and rebuilds manually.
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val off = spark.table("graft_cbo_lineitem")
        .join(spark.table("graft_cbo_supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .join(spark.table("graft_cbo_nation"),
          col("s_nationkey") === col("n_nationkey"))
        .join(spark.table("graft_cbo_part")
          .filter(col("p_brand") === "Brand#4"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n_items"))
      assert(leafOrder(off).last == "part",
        s"without cbo the syntax order must hold, got ${leafOrder(off)}")
      // and the reorder changes the PLAN, not the ANSWER
      val rows = reordered.collect()
      assert(rows.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevReorder)
    }
  }

  test("grow-with-N: ExactSubstr at 2K — longer spans are a strict " +
      "subset criterion, so per-doc coverage can only shrink") {
    val c8 = DedupOps.exactSubstrCoverage(spark, sf, K = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val c16 = DedupOps.exactSubstrCoverage(spark, sf, K = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(c8.nonEmpty, "no dup spans at K=8 — test is vacuous")
    // every doc flagged at K=16 is flagged at K=8 with >= coverage
    // (a duplicated 16-window contains nine duplicated 8-windows)
    c16.foreach { case (doc, cov16) =>
      assert(c8.contains(doc), s"doc $doc flagged only at K=16")
      assert(c8(doc) >= cov16,
        s"doc $doc coverage grew with K: ${c8(doc)} < $cov16")
    }
  }

  test("ExactSubstr at K=32 over long docs: candidate set is exactly " +
      "the >=2-doc anchors — sub-K spans contribute nothing, unique " +
      "text contributes nothing, coverage is the planted span") {
    // 6 docs × 500 tokens. Docs 0/1 share a 64-token span (different
    // positions); docs 2/3 share a 31-token span (one below K — must
    // be invisible at K=32); docs 4/5 are fully unique.
    val span64 = (1 to 64).map(i => s"X$i")
    val span31 = (1 to 31).map(i => s"Y$i")
    def doc(id: Long, planted: Seq[String], at: Int): (Long, String) = {
      val fill = (0 until 500 - planted.size).map(i => s"d${id}t$i")
      (id, (fill.take(at) ++ planted ++ fill.drop(at)).mkString(" "))
    }
    val docs = Seq(
      doc(0L, span64, 100), doc(1L, span64, 300),
      doc(2L, span31, 50), doc(3L, span31, 200),
      doc(4L, Seq.empty, 0), doc(5L, Seq.empty, 0),
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("q157k32").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val toks = DedupOps.exactSubstrToks(spark, dir, 32)
    // the corpus holds 6×(500-31) = 2814 anchors; only the 64-token
    // span's (64-32+1) = 33 windows per doc are duplicated at K=32 —
    // a broken prune (corpus² shape) or a K-8 leak (the 31-span) would
    // both surface here
    val cand = DedupOps.exactSubstrCandidates(toks, K = 32)
    assert(cand.count() === 66L,
      "candidates must be exactly the 2x33 planted >=2-doc anchors")
    assert(cand.select("doc_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L))
    // coverage = the planted span, position-independent
    val cov = DedupOps.exactSubstrCoverage(spark, dir, K = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cov.toSeq === Seq((0L, 500L, 64L), (1L, 500L, 64L)),
      s"got ${cov.toSeq}")
  }

  test("q161 span removal: the first global occurrence keeps its span, " +
      "every other occurrence is cut; keeper-only docs are untouched") {
    val shared = (1 to 10).map(i => s"S$i")
    val docs = Seq(
      (0L, ((1 to 5).map(i => s"u$i") ++ shared ++
        (6 to 10).map(i => s"u$i")).mkString(" ")), // keeper (lowest id)
      (1L, ((1 to 5).map(i => s"v$i") ++ shared ++
        (6 to 10).map(i => s"v$i")).mkString(" ")),
      (2L, ((1 to 5).map(i => s"w$i") ++ shared ++
        (6 to 10).map(i => s"w$i")).mkString(" ")),
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("q161spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DedupOps.q161ExactSubstrRemove(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toList
    // doc 0 holds every gram's first occurrence -> no removed anchors,
    // absent; docs 1 and 2 lose the whole 10-token span
    assert(got == List((1L, 20L, 10L, 10L), (2L, 20L, 10L, 10L)),
      s"got $got")
  }

  test("q160 state bootstrap: drained stream totals equal the batch " +
      "aggregate over history+stream; history-only keys emit nothing") {
    val rows = graft.ops.EventOps.q160StateBootstrap(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(rows.nonEmpty)
    val cutoff = 1705363200000000000L
    val e = graft.Tables.events(spark, sf)
    val active = e.filter(col("ts") >= cutoff)
      .select(col("user_id")).distinct()
    val batch = e.join(active, Seq("user_id"), "left_semi")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value*100) AS BIGINT)")).as("cents"))
      .orderBy(col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(rows == batch, "cutover must lose and double-count nothing")
    // micro-fixture for the key shapes sf0.001 lacks: a history-only
    // user must NOT emit (state seeded, never touched), a mixed user
    // folds history+stream, a stream-only user starts from zero
    val cutMs = 1705363200000L
    def t(offMs: Long) = new java.sql.Timestamp(cutMs + offMs)
    val fx = Seq(
      (1L, t(-60000L), 1L, "view", 1.0, ""), // history-only
      (2L, t(-60000L), 2L, "view", 2.0, ""), // mixed: history half
      (3L, t(60000L), 2L, "view", 3.0, ""),  //        stream half
      (4L, t(60000L), 3L, "view", 4.0, ""),  // stream-only
      (5L, t(120000L), 3L, "view", 5.0, ""),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // the harness layout is a FILE named events.parquet, not a dir
    val fdir = java.nio.file.Files.createTempDirectory("q160spec").toString
    fx.coalesce(1).write.mode("overwrite").parquet(s"$fdir/stage")
    val part = new java.io.File(s"$fdir/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$fdir/events.parquet"))
    val got = graft.ops.EventOps.q160StateBootstrap(spark, fdir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toList
    assert(got == List((2L, 2L, 500L), (3L, 2L, 900L)), s"got $got")
  }

  test("grow-with-N: doubling q39's df cap only ADDS pairs, and shared " +
      "pairs keep bit-identical Jaccard (cap prunes discovery, never " +
      "the denominator)") {
    def pairs(cap: Int): Map[(Long, Long), Double] =
      DedupOps.jaccardPairsCore(spark, sf, cap).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val p20 = pairs(20)
    val p40 = pairs(40)
    assert(p20.nonEmpty, "cap=20 finds no pairs — test is vacuous")
    assert(p20.keySet.subsetOf(p40.keySet),
      s"cap=40 lost pairs: ${(p20.keySet -- p40.keySet).take(5)}")
    p20.foreach { case (k, j) =>
      assert(p40(k) == j, s"pair $k jaccard drifted: $j vs ${p40(k)}")
    }
  }

  test("grow-with-N: q111 SemDeDup at k=32 still PARTITIONS the corpus " +
      "— every vector in exactly one cluster at both operating points") {
    val n = graft.Tables(spark, sf, "embeddings").count()
    for (k <- Seq(16, 32)) {
      val rows = SimilarityOps.semDedupCore(spark, sf, k).collect()
      assert(rows.map(_.getAs[Long]("n_vectors")).sum == n,
        s"k=$k cluster sizes must sum to the corpus ($n)")
      assert(rows.length <= k, s"k=$k produced ${rows.length} clusters")
      rows.foreach(r => assert(
        r.getAs[Long]("n_pruned") <= r.getAs[Long]("n_vectors")))
    }
  }

  test("grow-with-N: q92 kNN graph at half the planes (2× bucket " +
      "width) — prefix signatures make buckets coarsen into supersets: " +
      "node coverage grows, best-neighbor cosine never degrades") {
    def best(nPlanes: Int): Map[Long, Double] =
      SimilarityOps.knnGraphCore(spark, sf, nPlanes)
        .filter(col("rn") === 1L).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Double]("cos_sim"))
        .toMap
    val g8 = best(8)
    val g4 = best(4)
    assert(g8.nonEmpty, "8-plane graph empty — test is vacuous")
    assert(g8.keySet.subsetOf(g4.keySet),
      s"coarser buckets lost nodes: ${(g8.keySet -- g4.keySet).take(5)}")
    g8.foreach { case (node, c8) =>
      assert(g4(node) >= c8,
        s"node $node recall degraded: ${g4(node)} < $c8")
    }
  }

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest to hide from every hunter"

  test("q135 CDC: content-defined boundaries survive a prepend edit " +
      "that destroys every fixed-size chunk") {
    val rows = TextOps.q135CdcChunks(spark, sf).collect()
    assert(rows.nonEmpty)
    // CDC: only the chunk the insertion lands in changes
    assert(rows.forall(_.getAs[Long]("retained_pct") >= 60L),
      rows.map(r => s"${r.getAs[String]("source")}=" +
        s"${r.getAs[Long]("retained_pct")}").mkString(", "))
    // the contrast: FIXED 8-word chunking under the SAME one-word
    // prepend shifts every boundary -> near-zero surviving chunks
    val fixedRetained = graft.Tables(spark, sf, "documents")
      .select(split(col("text"), " ").as("ws"))
      .select(col("ws"), concat(array(lit("xEDITx")), col("ws")).as("ws2"))
      .selectExpr(
        """size(array_intersect(
          | transform(sequence(0, (size(ws) - 1) DIV 8),
          |   j -> concat_ws(' ', slice(ws, j * 8 + 1, 8))),
          | transform(sequence(0, (size(ws2) - 1) DIV 8),
          |   j -> concat_ws(' ', slice(ws2, j * 8 + 1, 8))))) AS ret
          |""".stripMargin,
        "(size(ws) + 7) DIV 8 AS n")
      .agg(expr("(100 * sum(ret)) DIV sum(n)").as("pct"))
      .head().getLong(0)
    assert(fixedRetained <= 10L,
      s"fixed-size chunking should lose ~every chunk under a shift, " +
        s"retained $fixedRetained%")
  }

  test("MinHash-LSH surfaces a planted near-duplicate pair") {
    val docs = Seq(
      (0L, base),
      (1L, base.replace("lazy", "sleepy")), // near-dup of 0
      (2L, "completely different text about spark catalyst optimizer " +
        "rules and whole stage codegen for analytical queries at scale"),
    ).toDF("doc_id", "text")
    val withSh = docs.select($"doc_id", DedupOps.shingles3($"text").as("sh"))
    val cands = DedupOps.lshCandidates(withSh, nHashes = 32, bands = 16)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((0L, 1L)), s"expected planted pair, got $cands")
    assert(!cands.contains((0L, 2L)) && !cands.contains((1L, 2L)),
      "unrelated doc must not be a candidate")
  }

  test("AQE splits the manufactured hot key into a skew join " +
      "(SortMergeJoin skew=true in the final adaptive plan)") {
    // thresholds lowered so the tiny test data registers as skewed; the
    // production defaults (256 MiB) fire on real hot keys at scale
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val li = graft.Tables(spark, sf, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val joined = Relational.skewedJoin(li,
        graft.Tables(spark, sf, "orders"), replicate = 5000)
      // collect() drives THIS DataFrame's own queryExecution, so AQE
      // finalizes the plan we assert on (count() would plan separately)
      val n = joined.collect().length
      assert(n > 5000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split SortMergeJoin in the final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE injects a runtime bloom filter on the scan side of a " +
      "selective shuffle join (100 TB scan-pruning path)") {
    // thresholds lowered so the tiny test data qualifies; production
    // defaults (10 MiB creation side) fire on real selective dims.
    // The injected bloom_filter_might_contain prunes probe-side rows
    // BEFORE the shuffle — at scale that is the difference between
    // shuffling the full fact table and shuffling the matching slice.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val orders = graft.Tables(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val li = graft.Tables(spark, sf, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") &&
        plan.contains("might_contain"),
        s"expected an injected runtime bloom filter:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed join plans without any Exchange (broadcast disabled)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (o, l) = Relational.bucketedOrdersLineitem(spark, sf)
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() > 0)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q83/q84 subqueries decorrelate: no per-row subquery survives, " +
      "EXISTS/NOT EXISTS become semi/anti joins") {
    // A scalar-subquery or exists-subquery expression left in the
    // optimized plan would re-run the inner query per outer row — the
    // O(rows × subquery) shape that cannot survive at scale. Catalyst
    // must rewrite both into joins.
    val p83 = Relational.q83ScalarSubquery(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!p83.contains("scalar-subquery"), p83)
    assert(p83.contains("Join"), p83)
    val p84 = Relational.q84ExistsSubquery(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!p84.contains("exists-subquery"), p84)
    assert(p84.contains("LeftSemi") && p84.contains("LeftAnti"), p84)
  }

  test("BloomSketch: no false negatives across partitioned build/merge, " +
      "probe agrees with the local reference, SQL surface registered") {
    import graft.functions.{BloomContains, BloomSketch}
    val m = 1 << 14
    val keys = (0L until 1000L).map(_ * 7919L)
    // 8 partitions force partial-buffer merges through the OR path
    val df = spark.createDataFrame(keys.map(Tuple1(_))).toDF("k")
      .repartition(8)
    val bloom = df.agg(BloomSketch.build(col("k"), m, 7).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // every inserted key must probe true (no false negatives, ever)
    assert(keys.forall(BloomSketch.contains(bloom, _, m, 7)))
    // distributed probe agrees with the local helper on absent keys
    val absent = (0L until 2000L).map(_ * 7919L + 1L)
    val got = spark.createDataFrame(absent.map(Tuple1(_))).toDF("k")
      .crossJoin(spark.createDataFrame(Seq(Tuple1(bloom))).toDF("bf"))
      .select(col("k"), BloomSketch.mightContain(col("bf"), col("k")).as("in"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(absent.forall(k =>
      got(k) == BloomSketch.contains(bloom, k, m, 7)))
    // some absent keys are false positives, most are not (m/n ≈ 16)
    val fp = absent.count(got)
    assert(fp < absent.length / 10, s"fp rate too high: $fp")
    // SQL registration end-to-end
    df.createOrReplaceTempView("bloom_keys")
    val viaSql = spark.sql(
      s"""SELECT bloom_contains((SELECT bloom_build(k, $m) FROM bloom_keys),
         |  ${keys.head}L) AS hit""".stripMargin).head().getBoolean(0)
    assert(viaSql)
    assert(BloomContains.K == 7) // q93's build arity is pinned to the probe
    // LITERAL probe ≡ column probe — the equivalence the q93/q95 shape
    // relies on (driver-held sketch as lit(bytes): codegen references
    // ONE shared byte[]; the old crossJoin-a-bf-column shape paid a
    // per-row getBinary copy of the whole sketch per probe expression)
    val viaLit = spark.createDataFrame(absent.map(Tuple1(_))).toDF("k")
      .select(col("k"), BloomSketch.mightContain(lit(bloom), col("k")).as("in"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(absent.forall(k => viaLit(k) == got(k)))
    // and the q93 plan carries NO nested-loop join anymore: the sketch
    // rides the plan as a literal, not a cross-joined one-row relation
    val p93 = Relational.q93BloomPrune(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p93.contains("BroadcastNestedLoopJoin"), p93)
  }

  test("sorted layout: range-partitioned files are shipdate-disjoint " +
      "and the range scan pushes its predicates to the footers") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_q96_spec").toString
    graft.Tables(spark, sf, "lineitem")
      .select(col("l_shipdate"), col("l_returnflag"), col("l_quantity"))
      .repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
      .write.mode("overwrite").parquet(path)
    // per-file min/max: sorted by min, each file's max precedes the next
    // file's min (boundary ties allowed) — the zone-map property parquet
    // footer pruning needs
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.length > 1, s"expected a multi-file layout: $files")
    def epoch(v: Any): Long = v match {
      case t: java.time.LocalDateTime =>
        t.toEpochSecond(java.time.ZoneOffset.UTC)
      case t: java.sql.Timestamp => t.getTime / 1000L
    }
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("l_shipdate")), max(col("l_shipdate"))).head()
      (epoch(r.get(0)), epoch(r.get(1)))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping file ranges: $ranges")
      case _ =>
    }
    // a one-year slice intersects strictly fewer files than the table
    // spans — the footer stats admit real pruning
    val lo = java.time.LocalDate.parse("1995-01-01")
      .toEpochDay * 86400L
    val hi = java.time.LocalDate.parse("1996-01-01")
      .toEpochDay * 86400L
    val touched = ranges.count { case (mn, mx) => mx >= lo && mn < hi }
    assert(touched < ranges.length,
      s"range layout should localize the year slice: $ranges")
    // and the scan-side predicates reach the parquet reader
    val q = spark.read.parquet(path).filter(
      col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("LessThan(l_shipdate"), plan)
  }

  test("z-order layout: files carry tight TWO-column zone maps, a box " +
      "predicate prunes files, and both predicates reach the footers") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_q107_spec").toString
    graft.Tables(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .withColumn("zv",
        graft.ops.Relational.zValue(col("l_partkey"), col("l_suppkey")))
      .repartitionByRange(8, col("zv"))
      .sortWithinPartitions(col("zv"))
      .drop("zv")
      .write.mode("overwrite").parquet(path)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.length > 1, s"expected a multi-file layout: $files")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // the curve's point: a box on BOTH dimensions intersects strictly
    // fewer files than the table spans — a partkey-only sort would leave
    // every file spanning the full supplier range (no suppkey pruning)
    val (pLo, pHi, sLo, sHi) = (1L, 100L, 1L, 5L)
    val touched = ranges.count { case (pmn, pmx, smn, smx) =>
      pmx >= pLo && pmn <= pHi && smx >= sLo && smn <= sHi
    }
    assert(touched < ranges.length,
      s"z-order should localize the box on both dims: $ranges")
    // and BOTH box predicates reach the parquet reader's footer pruning
    // (read the scan's metadata, not the plan string — simpleString
    // truncates long filter lists)
    val q = spark.read.parquet(path)
      .filter(col("l_partkey") <= 100 && col("l_suppkey") <= 5)
    val pushed = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata("PushedFilters")
    }.mkString
    assert(pushed.contains("LessThanOrEqual(l_partkey") &&
      pushed.contains("LessThanOrEqual(l_suppkey"), pushed)
    // bit-exactness of the curve itself: interleave(3,5) =
    // spread(3)|spread(5)<<1 = 0b010111 + known corner values
    val z = spark.range(1).select(
      graft.ops.Relational.zValue(lit(3), lit(5)).as("a"),
      graft.ops.Relational.zValue(lit(0), lit(0)).as("b"),
      graft.ops.Relational.zValue(lit(65535), lit(65535)).as("c")).head()
    assert(z.getLong(0) == 39L) // a=3→bits 0,1 even; b=5→bits 0,2 odd
    assert(z.getLong(1) == 0L)
    assert(z.getLong(2) == 0xFFFFFFFFL)
  }

  test("Checkpoints.release frees a localCheckpoint's storage blocks " +
      "immediately (not GC-lagged) — the iteration-loop lifecycle") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ck = spark.range(1000).toDF("v").localCheckpoint()
    val mine = sc.getPersistentRDDs.keySet.diff(before)
    assert(mine.nonEmpty, "localCheckpoint should register persisted RDDs")
    assert(ck.count() == 1000)
    graft.ops.Checkpoints.release(ck)
    // unpersist is async (blocking=false) but the registry update is
    // driver-side and immediate
    val after = sc.getPersistentRDDs.keySet
    assert(mine.forall(!after.contains(_)),
      s"release should drop the checkpoint blocks: kept ${mine.intersect(after)}")
  }

  test("q101 leaves NO cache or persistent-RDD debt beyond its own " +
      "small checkpointed result (the round-9 bench regression class)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = graft.ops.DedupOps.q101PrefixJoin(spark, sf)
    out.collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "q101 must unpersist its staged shingle table")
    // only the small checkpointed RESULT may remain registered
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    assert(leaked.size <= 2,
      s"q101 left ${leaked.size} persisted RDDs behind (expected just its result)")
  }

  test("bigram-LM surprise: ONE explode serves both model tables " +
      "(no corpus re-explode, no join-back)") {
    val plan = graft.ops.TextOps.q109BigramSurprise(spark, sf)
      .queryExecution.optimizedPlan.toString
    val nGen = "Generate explode".r.findAllIn(plan).length
    assert(nGen == 1, s"expected exactly one explode in the plan:\n$plan")
    assert(!plan.contains("Join"), s"model tables must ride windows, not joins:\n$plan")
  }

  test("budget water-filling: grants never exceed the budget, saturated " +
      "sources keep everything, clipped sources share one common cap") {
    val rows = graft.ops.TextOps.q110BudgetFill(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = rows.head.getAs[Long]("budget")
    val allocSum = rows.map(_.getAs[Long]("alloc")).sum
    assert(allocSum <= budget, s"over-allocated: $allocSum > $budget")
    val clippedCaps = rows.filter(!_.getAs[Boolean]("sat"))
      .map(_.getAs[Long]("alloc")).distinct
    assert(clippedCaps.length <= 1,
      s"clipped sources must share one cap: ${clippedCaps.mkString(",")}")
    rows.filter(_.getAs[Boolean]("sat")).foreach { r =>
      assert(r.getAs[Long]("alloc") == r.getAs[Long]("toks"),
        s"saturated source must keep its total: $r")
    }
    // the water level is tight: granting every clipped source one more
    // unit would blow the budget (floor-division exactness)
    val nClipped = rows.count(!_.getAs[Boolean]("sat"))
    if (nClipped > 0)
      assert(allocSum + nClipped > budget,
        s"cap not tight: $allocSum + $nClipped <= $budget")
  }

  test("sequence packing: sequences partition the doc stream exactly — " +
      "per-shard doc counts and id checksums reconstruct the input") {
    val rows = graft.ops.TextOps.q106SequencePack(spark, sf).collect()
    assert(rows.nonEmpty)
    val docsTotal = graft.Tables(spark, sf, "documents")
      .filter(col("doc_id").isNotNull).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docsTotal,
      "every document must land in exactly one sequence")
    val idSum = rows.map(_.getAs[Long]("id_sum")).sum
    val expect = graft.Tables(spark, sf, "documents")
      .agg(sum(col("doc_id"))).head().getLong(0)
    assert(idSum == expect, "membership checksum must cover the corpus once")
  }

  test("curation pipeline: the quartile-threshold broadcast is built " +
      "once and REUSED by both consuming branches") {
    val q = graft.ops.TextOps.q108CurationPipeline(spark, sf)
    // collect() drives THIS DataFrame's own queryExecution, so AQE
    // finalizes the plan we assert on
    val rows = q.collect()
    assert(rows.nonEmpty)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") ||
      plan.contains("BroadcastQueryStage"),
      s"expected the threshold broadcast to be shared, not recomputed:\n$plan")
    // and the reuse is real: exactly one materialized broadcast of the
    // single-row threshold frame feeds two BroadcastNestedLoopJoins
    val nBnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(nBnlj >= 2, s"expected both branches to consume the broadcast:\n$plan")
  }

  test("group sample plans a WindowGroupLimit (per-group top-k pruned " +
      "map-side, not a full per-group sort)") {
    val plan = graft.ops.TextOps.q97GroupSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("CountMin: never undercounts across partitioned build/merge, " +
      "matches the local reference exactly, SQL surface registered") {
    import graft.functions.{BloomSketch, CountMin}
    val w = 256
    // 400 distinct keys, key i inserted (i % 5) + 1 times — w=256 forces
    // real collisions so the min-over-rows path is actually exercised
    val keys = (0L until 400L).flatMap(i => Seq.fill((i % 5).toInt + 1)(i * 6151L))
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // 8 partitions force partial-buffer merges through the add path
    val df = spark.createDataFrame(keys.map(Tuple1(_))).toDF("k")
      .repartition(8)
    val cms = df.agg(CountMin.build(col("k"), w).as("cms"))
      .head().getAs[Array[Byte]]("cms")
    assert(cms.length == CountMin.D * w * 8)
    // local reference counter matrix, built sequentially
    val ref = new Array[Long](CountMin.D * w)
    for (k <- keys; r <- 0 until CountMin.D)
      ref(r * w + BloomSketch.pos(k, r, w)) += 1L
    def refEst(k: Long): Long =
      (0 until CountMin.D).map(r => ref(r * w + BloomSketch.pos(k, r, w))).min
    // distributed estimate == sequential reference for every key (the
    // merge path adds, so partitioning cannot change a single counter)
    val got = spark.createDataFrame(exact.keys.map(Tuple1(_)).toSeq).toDF("k")
      .crossJoin(spark.createDataFrame(Seq(Tuple1(cms))).toDF("cms"))
      .select(col("k"), CountMin.estimateCol(col("cms"), col("k")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(got(k) == refEst(k), s"key $k: ${got(k)} vs ref ${refEst(k)}")
      assert(got(k) >= n, s"CM undercount at $k: ${got(k)} < $n")
    }
    // collisions exist at this width, so some estimate overcounts...
    assert(exact.exists { case (k, n) => got(k) > n })
    // ...and a comfortably wide sketch is exact on the same data
    val wide = df.agg(CountMin.build(col("k"), 1 << 16).as("cms"))
      .head().getAs[Array[Byte]]("cms")
    exact.foreach { case (k, n) =>
      assert(CountMin.estimate(wide, k) == n)
    }
    // SQL registration end-to-end
    df.createOrReplaceTempView("cms_keys")
    val viaSql = spark.sql(
      s"""SELECT cms_estimate((SELECT cms_build(k, $w) FROM cms_keys),
         |  ${keys.head}L) AS est""".stripMargin).head().getLong(0)
    assert(viaSql == got(keys.head))
    // LITERAL probe ≡ column probe — the equivalence q94/q127 rely on
    // (driver-held sketch as lit(bytes), the same discipline the Bloom
    // test pins for q93/q95)
    val viaLit = spark.createDataFrame(exact.keys.map(Tuple1(_)).toSeq)
      .toDF("k")
      .select(col("k"), CountMin.estimateCol(lit(cms), col("k")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.keys.forall(k => viaLit(k) == got(k)))
    // and the q94 plan carries NO nested-loop join anymore: the sketch
    // rides the plan as a literal, not a cross-joined one-row relation
    val p94 = Relational.q94CmsFrequency(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p94.contains("BroadcastNestedLoopJoin"), p94)
  }

  test("incremental dedup: bloom candidates cover every exact dup " +
      "(no false negatives, independently recomputed)") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.ops.DedupOps.q95IncrementalDedup(spark, dir).collect()
    // candidate set decomposes exactly into dups + false positives
    out.foreach { r =>
      assert(r.getAs[Long]("n_cand") ==
        r.getAs[Long]("n_dup") + r.getAs[Long]("n_fp"))
      assert(r.getAs[Long]("n_cand") <= r.getAs[Long]("n_chunks"))
    }
    // recompute dup chunks WITHOUT the sketch: a bloom false negative
    // would make q95's n_dup undercount this ground truth
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), explode(
        when(size(col("ws")) < 10, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), (size(col("ws")) / 10).cast("int") - 1),
            i => array_join(slice(col("ws"), i * 10 + 1, lit(10)), " "))))
        .as("chunk"))
    val nDupTruth = docs.filter(col("doc_id") % 10 === 0)
      .join(docs.filter(col("doc_id") % 10 =!= 0).select("chunk").distinct(),
        Seq("chunk"), "left_semi")
      .count()
    assert(out.map(_.getAs[Long]("n_dup")).sum == nDupTruth)
  }

  test("prefix-filtered similarity join is lossless: matches the " +
      "brute-force all-pairs sweep at the same threshold") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.ops.DedupOps.q101PrefixJoin(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: every pair, no filter — the ground truth the prefix
    // theorem must reproduce exactly (any missing pair = a false
    // negative, any extra = a broken verify)
    val d = graft.Tables(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), graft.ops.DedupOps.shingles3(col("text")).as("shs"))
    val truth = d.select(col("doc_id").as("doc_a"), col("shs").as("sa"))
      .crossJoin(d.select(col("doc_id").as("doc_b"), col("shs").as("sb")))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("ni", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("nu", size(col("sa")) + size(col("sb")) - col("ni"))
      .filter(col("ni") * 10 >= col("nu") * 6)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "threshold finds no pairs — test is vacuous")
    assert(got == truth,
      s"missing=${(truth -- got).take(5)} extra=${(got -- truth).take(5)}")
  }

  test("chunk dedup counts a planted repeated chunk, drops short docs") {
    val rep = (1 to 10).map(i => s"w$i").mkString(" ") // one exact chunk
    val docs = Seq(
      (0L, rep + " " + (1 to 10).map(i => s"u$i").mkString(" ")),
      (1L, rep + " trailing words that do not fill a chunk"), // dup of 0's
      (2L, "only five words right here"), // <10 words → no chunks
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("q57spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.q57ChunkDedup(spark, dir)
      .as[(Long, Long, Long)].collect().toList
    // doc 0: 2 chunks, both first occurrences; doc 1: its `rep` chunk is
    // a corpus-level duplicate (7 trailing words drop); doc 2 disappears
    assert(got == List((0L, 2L, 0L), (1L, 1L, 1L)), s"got $got")
  }

  test("connectedComponents: transitive chains collapse to the min id, " +
      "disjoint components stay apart") {
    // chain 5-3-8 plus an isolated pair (1,9): hash-min needs >1 round
    // for the chain, so this pins the propagation, not just the init
    val edges = Seq((5L, 3L), (3L, 8L), (9L, 1L), (40L, 41L), (41L, 42L),
      (42L, 43L), (43L, 44L)) // a 5-node path: diameter 4
      .toDF("doc_a", "doc_b")
    val got = DedupOps.connectedComponents(edges, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 3L, 5L -> 3L, 8L -> 3L, 1L -> 1L, 9L -> 1L,
      40L -> 40L, 41L -> 40L, 42L -> 40L, 43L -> 40L, 44L -> 40L))
  }

  test("connectedComponents reliable-checkpoint mode: same labels, " +
      "checkpoint files actually written") {
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val edges = Seq((5L, 3L), (3L, 8L), (9L, 1L), (40L, 41L), (41L, 42L))
      .toDF("doc_a", "doc_b")
    val got = DedupOps.connectedComponents(edges, "doc_a", "doc_b",
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 3L, 5L -> 3L, 8L -> 3L, 1L -> 1L, 9L -> 1L,
      40L -> 40L, 41L -> 40L, 42L -> 40L))
    // the reliable dir was really used (rdd checkpoint files on disk)
    def count(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(count).sum else 1
    assert(count(new java.io.File(dir)) > 0, "no checkpoint files written")
  }

  test("SimHash: near-dups have small hamming distance, unrelated large") {
    val docs = Seq((0L, base), (1L, base.replace("lazy", "sleepy")),
      (2L, "completely different text about spark catalyst optimizer " +
        "rules and whole stage codegen for analytical queries at scale"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents")
    // reuse the query impl over a temp dir-less path: build directly
    val tokens = array_distinct(split($"text", " "))
    val hashes = transform(tokens, t => xxhash64(t))
    val simhash = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    val sigs = docs.select($"doc_id", simhash.as("sig")).as[(Long, Long)]
      .collect().toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(0L), sigs(1L)) <= 12,
      s"near-dup hamming was ${hamming(sigs(0L), sigs(1L))}")
    assert(hamming(sigs(0L), sigs(2L)) > 12,
      s"unrelated hamming was ${hamming(sigs(0L), sigs(2L))}")
  }

  test("CosineSimilarity expression matches zip_with form and codegens") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables(spark, sf, "embeddings").filter(col("vec_id") < 50)
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("ib"), col("embedding").as("b")))
    val expr = pairs.select(col("ia"), col("ib"),
      graft.functions.CosineSimilarity(col("a"), col("b")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val hof = pairs.select(col("ia"), col("ib"),
      (SimilarityOps.dot(col("a"), col("b")) /
        (SimilarityOps.l2norm(col("a")) * SimilarityOps.l2norm(col("b"))))
        .as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(expr.keySet == hof.keySet && expr.nonEmpty)
    expr.foreach { case (k, v) => assert(v == hof(k), s"$k: $v != ${hof(k)}") }
    // inside whole-stage codegen (no interpreted fallback) — AQE shows
    // codegen spans only in the final (post-execution) plan
    val pdf = pairs.select(
      graft.functions.CosineSimilarity(col("a"), col("b")).as("c"))
    pdf.collect()
    val plan = pdf.queryExecution.executedPlan.toString
    // "*(n) Project [cosinesimilarity(...)" — the * prefix marks a
    // whole-stage-codegen span containing the expression
    assert(plan.contains("*(") && plan.contains("cosinesimilarity"), plan)
    // zero-norm → null
    val z = spark.sql(
      "SELECT cast(array(0.0, 0.0) as array<double>) a, cast(array(1.0, 1.0) as array<double>) b")
    assert(z.select(graft.functions.CosineSimilarity(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("native expressions are registered as SQL functions") {
    import org.apache.spark.sql.functions._
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       size(word_shingles('a b c d', 3)) AS ns,
        |       simhash64(array(-1L)) AS sh""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getInt(1) == 2)
    assert(r.getLong(2) == -1L) // every bit votes +1
    // parity with the Column API
    val viaCol = spark.range(1).select(
      graft.functions.WordShingles(lit("a b c d"), 3).as("s")).head()
      .getSeq[String](0)
    assert(viaCol == Seq("a b c", "b c d"))
  }

  test("WinnowFingerprints matches the HOF pipeline and registers in SQL") {
    import org.apache.spark.sql.functions._
    val k = 7; val w = 4
    val pows = Seq(887503681L, 28629151L, 923521L, 29791L, 961L, 31L, 1L)
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaa", "abcdefghij")
    val df = spark.createDataFrame(texts.map(Tuple1(_))).toDF("text")
    // reference form: transform/sequence gram hashes → window minima
    val grams = transform(sequence(lit(1), length(col("text")) - lit(k - 1)),
      i => pows.zipWithIndex.map { case (p, j) =>
        ascii(col("text").substr(i + lit(j), lit(1))).cast("long") * p
      }.reduce(_ + _))
    val mins = when(size(col("hashes")) >= 0,
      transform(sequence(lit(1), size(col("hashes")) - lit(w - 1)),
        s => array_min(slice(col("hashes"), s, lit(w)))))
    val viaHof = df.withColumn("hashes", grams)
      .select(array_sort(array_distinct(mins)).as("fps"))
      .collect().map(_.getSeq[Long](0))
    val viaNative = df.select(array_sort(
        graft.functions.WinnowFingerprints(col("text"), k, w)).as("fps"))
      .collect().map(_.getSeq[Long](0))
    assert(viaHof.toSeq == viaNative.toSeq)
    // short-input edge: below k+w-1 chars → empty fingerprint set
    val short = spark.sql("SELECT winnow_fingerprints('abcdefghi', 7, 4) f")
      .head().getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("approx_count_distinct stays within 5% of exact (q29 vs q09)") {
    val exact = Relational.q09CountDistinct(spark, sf)
      .select("l_returnflag", "n_orders").as[(String, Long)].collect().toMap
    val rows = Relational.q29ApproxDistinct(spark, sf)
      .select("l_returnflag", "exact_orders", "within_bound")
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (rf, eo, ok) =>
      assert(eo == exact(rf), s"$rf: exact_orders $eo vs q09 ${exact(rf)}")
      assert(ok, s"$rf: approx_count_distinct drifted outside the 5% bound")
    }
  }

  test("q72 BM25: higher-tf doc outranks lower-tf doc at equal length") {
    val out = TextOps.q72Bm25(spark, sf)
      .select("doc_id", "n_match", "bm25")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // every score positive, n_match bounded by the 3-term query
    out.foreach { case (id, m, s) =>
      assert(m >= 1 && m <= 3, s"doc $id n_match $m")
      assert(s > 0, s"doc $id bm25 $s")
    }
  }

  test("q73 rarity: scores bounded by min/max corpus token rarity") {
    val rows = TextOps.q73Rarity(spark, sf)
      .select("doc_id", "n_tokens", "rarity_sum", "mean_rarity")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, s, m) =>
      assert(n > 0 && s >= n, s"doc $id: rarity_sum $s < n_tokens $n")
      assert(m >= 1.0, s"doc $id mean_rarity $m below floor")
      assert(math.abs(m - s.toDouble / n) < 1e-12)
    }
  }

  test("q74 recall: per-query recall in [0,1], exact side always k=3, " +
      "and a self-consistent hit ratio") {
    val rows = SimilarityOps.q74AnnRecall(spark, sf)
      .select("q_id", "n_exact", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, ne, nh, r) =>
      assert(ne == 3, s"query $q exact top-k $ne")
      assert(nh >= 0 && nh <= ne, s"query $q hits $nh")
      assert(math.abs(r - nh.toDouble / ne) < 1e-12)
    }
  }

  test("b30 histogram: per-plane bin counts sum to the plane pixel count") {
    val sums = BioQueries.b30PlaneHistogram(spark, sf)
      .groupBy("c").agg(sum("n_px").as("n"))
      .select("c", "n").as[(Long, Long)].collect().toMap
    assert(sums.keySet == Set(0L, 1L))
    sums.foreach { case (c, n) => assert(n == 48L, s"plane $c total $n") }
  }

  test("q76 PageRank: ranks bounded by the damping fixed-point range") {
    val rows = GraphOps.q76PageRank(spark, sf)
      .select("part_id", "pr").as[(Long, Long)].collect()
    assert(rows.length == 20)
    // with r0 = 10^6 everywhere: r >= 0.15 floor; the top-20 of a
    // connected co-purchase graph sits above the uniform start
    rows.foreach { case (p, r) =>
      assert(r >= 150000L, s"part $p rank $r below damping floor")
      assert(r < 100000000L, s"part $p rank $r implausibly large")
    }
    assert(rows.head._2 >= 1000000L, "top rank should exceed uniform start")
    // descending, deterministic tie-break
    assert(rows.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("q77 triangles: positive descending counts over the subgraph") {
    val rows = GraphOps.q77Triangles(spark, sf)
      .select("part_id", "n_triangles").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (p, n) =>
      assert(p < 2000, s"part $p outside the subgraph bound")
      assert(n > 0, s"part $p reported zero triangles")
    }
    assert(rows.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("q77 oriented count equals brute-force triangle enumeration") {
    // brute force: id-ordered 3-clique enumeration a<b<c over the same
    // undirected subgraph — each triangle found exactly once
    val li = graft.Tables(spark, sf, "lineitem")
      .filter(col("l_partkey") < 2000)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e0 = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
    val brute = e0.as("x").join(e0.as("y"), col("x.v") === col("y.u"))
      .join(e0.as("z"),
        col("x.u") === col("z.u") && col("y.v") === col("z.v"))
      .count()
    val oriented = GraphOps.triangleCounts(spark, sf)
      .agg(sum("n_triangles")).as[Long].head()
    assert(oriented == 3 * brute,
      s"per-node credits $oriented != 3 * $brute brute-force triangles")
    assert(brute > 0, "degenerate test graph: no triangles at all")
  }

  test("exact jaccard on planted pair exceeds LSH threshold") {
    val a = DedupOps.shingles3(lit(base))
    val b = DedupOps.shingles3(lit(base.replace("lazy", "sleepy")))
    val j = spark.range(1).select(
      (size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b))).as("j")).head().getDouble(0)
    assert(j > 0.5, s"planted jaccard $j")
  }

  test("q111 SemDeDup: partition of the corpus, pruned strictly within " +
      "clusters, pair join is an equi-join on cent_id (Σ cluster², " +
      "never corpus²)") {
    val total = graft.Tables(spark, sf, "embeddings").count()
    val rows = SimilarityOps.q111SemDedup(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == total,
      "clusters must partition the corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pruned") < r.getAs[Long]("n_vectors"),
        s"a cluster may never prune ALL members (lowest id survives): $r")
    }
    // the candidate pair join must key on cent_id — a cartesian pair
    // enumeration would be corpus² and cannot ship
    val plan = SimilarityOps.q111SemDedup(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"pair enumeration must not be a cartesian product:\n$plan")
  }

  test("q112 DSIR: target-language docs score higher on average than " +
      "the rest (the importance-tilt the resampler consumes)") {
    val rows = TextOps.q112DsirWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    val (en, rest) = rows.partition(_.getAs[String]("lang") == "en")
    assert(en.nonEmpty && rest.nonEmpty, "need both strata at this sf")
    def mean(rs: Array[org.apache.spark.sql.Row]): Double =
      rs.map(_.getAs[Double]("mean_imp")).sum / rs.length
    assert(mean(en) > mean(rest),
      s"en mean ${mean(en)} must exceed non-target mean ${mean(rest)}")
  }

  test("q113 chunk inventory: chunk count is ⌈len/stride⌉ and dedup " +
      "never exceeds the chunk count") {
    val lens = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .as[(Long, Long)].collect().toMap
    TextOps.q113ChunkDedup(spark, sf).collect().foreach { r =>
      val len = lens(r.getAs[Long]("doc_id"))
      val expected = if (len == 0) 1L else (len - 1) / 60 + 1
      assert(r.getAs[Long]("n_chunks") == expected,
        s"doc len $len: expected $expected chunks, got $r")
      assert(r.getAs[Long]("n_dup") <= r.getAs[Long]("n_chunks"))
    }
  }

  test("q114 repeated-shingle coverage: integer percentage bounds and " +
      "no join in the document-frequency pass (window over the same " +
      "exploded set)") {
    TextOps.q114BoilerplateCov(spark, sf).collect().foreach { r =>
      val pct = r.getAs[Long]("rep_pct")
      assert(pct >= 0 && pct <= 100, s"pct out of bounds: $r")
      assert(r.getAs[Long]("n_rep") <= r.getAs[Long]("n_shingles"))
    }
    val plan = TextOps.q114BoilerplateCov(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"),
      s"df must be a window over the exploded set, not a join-back:\n$plan")
  }

  test("q115 contrastive mining: ranks within kind, correct kind vs " +
      "label, negatives distinct from the query itself") {
    val labels = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label").cast("long")).as[(Long, Long)]
      .collect().toMap
    val rows = SimilarityOps.q115HardNegatives(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val n = r.getAs[Long]("neighbor_id")
      assert(n != q, s"self-pair leaked: $r")
      val sameLabel = labels(q) == labels(n)
      val kind = r.getAs[String]("kind")
      assert(if (kind == "pos") sameLabel else !sameLabel,
        s"kind/label mismatch: $r")
      assert(r.getAs[Long]("rank") >= 1 && r.getAs[Long]("rank") <= 2)
    }
  }

  test("q118 BPE pair stats: vocabulary-histogram counts equal the " +
      "direct corpus-explode counts (the trainer's O(vocab) shortcut " +
      "loses nothing)") {
    val top = TextOps.q118BpePairs(spark, sf).collect()
    assert(top.length == 20)
    // brute force: enumerate pairs over EVERY token occurrence
    val brute = graft.Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("w"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substring(w, i, 2)").as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    top.foreach { r =>
      val pair = r.getAs[String]("pair")
      assert(r.getAs[Long]("cnt") == brute(pair),
        s"histogram-weighted count diverges for '$pair'")
    }
    // ranks strictly ordered by (cnt desc, pair asc)
    val ranked = top.sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[Long]("cnt"), r.getAs[String]("pair")))
    assert(ranked.sliding(2).forall { w =>
      w(0)._1 > w(1)._1 || (w(0)._1 == w(1)._1 && w(0)._2 < w(1)._2)
    })
  }

  test("q116 cluster purity: majority count and share are consistent " +
      "and clusters cover the corpus") {
    val total = graft.Tables(spark, sf, "embeddings").count()
    val rows = SimilarityOps.q116ClusterPurity(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == total)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_vectors")
      val maj = r.getAs[Long]("maj_cnt")
      assert(maj >= 1 && maj <= n, s"majority out of range: $r")
      assert(r.getAs[Long]("purity_pct") == 100 * maj / n, s"purity: $r")
    }
  }

  test("q121 conjunctive search: every hit contains ALL query terms, " +
      "top-k plans as TakeOrdered (never a global sort), and the term " +
      "filter sits below the only token exchange") {
    val rows = TextOps.q121ConjunctiveSearch(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val hitIds = rows.map(_.getAs[Long]("doc_id")).toSet
    val texts = graft.Tables(spark, sf, "documents")
      .filter(col("doc_id").isInCollection(hitIds))
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    hitIds.foreach { id =>
      val toks = texts(id).split(" ").toSet
      Seq("spark", "join", "window").foreach(t =>
        assert(toks(t), s"doc $id missing conjunctive term '$t'"))
    }
    // scores non-increasing in emitted order
    val scores = rows.map(_.getAs[Long]("score"))
    assert(scores.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    val plan = TextOps.q121ConjunctiveSearch(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered, not a global sort:\n$plan")
  }

  test("q122 intra-doc repeat: map-only (no join, no aggregate " +
      "exchange before the final order) and the shingle algebra is " +
      "consistent per row") {
    val lens = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    TextOps.q122IntraDocRepeat(spark, sf).collect().foreach { r =>
      val n = lens(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_grams") == math.max(n - 2, 1L),
        s"sliding-trigram count: $r (n=$n)")
      assert(r.getAs[Long]("n_uniq") <= r.getAs[Long]("n_grams"))
      assert(r.getAs[Long]("n_rep") ==
        r.getAs[Long]("n_grams") - r.getAs[Long]("n_uniq"))
    }
    val opt = TextOps.q122IntraDocRepeat(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join"), s"q122 must be join-free:\n$opt")
    assert(!opt.contains("Aggregate"),
      s"q122 must not aggregate — the measure is in-row:\n$opt")
  }

  test("q124 partitioned layout: a source-filtered read prunes to one " +
      "hive partition directory (PartitionFilters in the scan, pruned " +
      "row count matches)") {
    val docs = graft.Tables(spark, sf, "documents")
    val base = s"/tmp/graft_q124spec_${java.util.UUID.randomUUID()}"
    docs.write.mode("overwrite").partitionBy("source").parquet(base)
    val expected = docs.filter(col("source") === "src3").count()
    val pruned = spark.read.parquet(base).filter(col("source") === "src3")
    assert(pruned.count() == expected)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("src3"),
      s"source predicate must prune partition dirs, not filter rows:\n$scan")
  }

  test("dynamic partition pruning: a runtime dim filter reaches the " +
      "fact scan's PartitionFilters as a dynamicpruning subquery, and " +
      "the join result matches the static-filter equivalent") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val base = s"/tmp/graft_dppspec_${java.util.UUID.randomUUID()}"
    docs.write.mode("overwrite").partitionBy("source").parquet(base)
    val fact = spark.read.parquet(base)
    // the partition predicate is only known AFTER filtering the dim —
    // exactly the star-join shape DPP exists for; a static planner
    // would scan every partition. The dim must come from a real source
    // (a local Seq constant-folds to a LocalRelation and the rule sees
    // no filter) and the predicate must stay "likely selective" after
    // optimization (EqualTo on a string — a boolean `keep` simplifies
    // to a bare attribute, which the rule does not count).
    val dimPath = s"$base-dim"
    Seq(("src1", "hot"), ("src2", "hot"), ("src3", "cold"),
      ("src4", "cold")).toDF("source", "grp")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim.filter(col("grp") === "hot"), Seq("source"))
      .agg(sum(col("n_chars")).as("s"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning partition filter:\n$plan")
    val expect = docs
      .filter(col("source").isInCollection(Seq("src1", "src2")))
      .agg(sum(col("n_chars"))).head().getLong(0)
    assert(joined.head().getLong(0) == expect,
      "DPP-pruned join must equal the static-filter aggregate")
  }

  test("q127 heavy hitters: the CMS prune loses NOTHING vs a " +
      "sketch-free exact recompute, and the candidate set is a strict " +
      "subset of the vocabulary (the pruning pays)") {
    val rows = TextOps.q127HeavyHitters(spark, sf).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt"))).toSet
    val toks = graft.Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
    val total = toks.count()
    val exact = toks.groupBy(col("t")).count()
      .filter(col("count") >= total / 200)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == exact,
      s"two-pass answer must be exact: ${rows.diff(exact)} extra, " +
        s"${exact.diff(rows)} missed")
    val vocab = toks.select(col("t")).distinct().count()
    assert(rows.size < vocab,
      "every token a heavy hitter — threshold not selective at this sf")
  }

  test("q130 HLL: union of per-group sketches estimates EXACTLY like " +
      "a direct whole-table sketch (lossless merge at equal lgK) and " +
      "every flag row is true") {
    val e = graft.Tables(spark, sf, "events")
      .select(col("event_type"), col("user_id"))
    val viaUnion = e.groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0)
    val direct = e
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))")
        .as("est")).head().getLong(0)
    assert(viaUnion == direct,
      s"sketch union must be lossless: union=$viaUnion direct=$direct")
    val rows = Relational.q130HllUnion(spark, sf).collect()
    assert(rows.nonEmpty &&
      rows.forall(_.getAs[Boolean]("within3pct")))
  }

  test("q131 theta sketches: partitioned build yields the SAME sketch " +
      "bytes as a single-partition build (order/partition-independent " +
      "state), and exact-mode estimates equal truth") {
    import graft.functions.Theta
    val keys = spark.range(0, 2000).select((col("id") * 7919L).as("k"))
    def skBytes(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(Theta.build(col("k")).as("sk")).head().getAs[Array[Byte]](0)
    val one = skBytes(keys.coalesce(1))
    val many = skBytes(keys.repartition(8))
    assert(java.util.Arrays.equals(one, many),
      "theta sketch state must be a pure function of the key set")
    val est = spark.range(1).select(
      Theta.estimate(lit(one)).as("e")).head().getDouble(0)
    assert(est == 2000.0d,
      s"below nominal entries the sketch is exact: got $est")
    // intersection of a set with itself is the set
    val selfInt = spark.range(1).select(
      Theta.intersectEstimate(lit(one), lit(many)).as("e"))
      .head().getDouble(0)
    assert(selfInt == 2000.0d, s"self-intersection must be exact: $selfInt")
  }

  test("q133 KLL: merged per-group sketches answer the global median " +
      "inside the rank bound, small sketches are exact, and every " +
      "emitted flag row is true") {
    import graft.functions.Kll
    // below k the sketch retains everything: quantiles are exact
    val small = spark.range(1, 101).select(col("id").cast("double").as("v"))
    val exactMed = small.agg(Kll.build(col("v")).as("sk"))
      .select(Kll.quantile(col("sk"), 0.5).as("m")).head().getDouble(0)
    assert(exactMed == 50.0d || exactMed == 51.0d,
      s"exact-mode median of 1..100 must be 50/51 (inclusive rank): " +
        s"got $exactMed")
    // the merge path: per-group build -> KllMerge rollup vs direct build
    val vals = spark.range(0, 20000)
      .select(pmod(col("id"), lit(7)).as("g"),
        ((col("id") * 2654435761L) % 1000003L).cast("double").as("v"))
    val viaMerge = vals.groupBy(col("g"))
      .agg(Kll.build(col("v")).as("sk"))
      .agg(Kll.merge(col("sk")).as("u"))
      .select(Kll.quantile(col("u"), 0.5).as("m"))
      .head().getDouble(0)
    val exact = vals.agg(
      expr("percentile(v, 0.45)"), expr("percentile(v, 0.55)")).head()
    assert(viaMerge >= exact.getDouble(0) && viaMerge <= exact.getDouble(1),
      s"merged-sketch median $viaMerge outside exact p45..p55 " +
        s"(${exact.getDouble(0)}..${exact.getDouble(1)})")
    val rows = Relational.q133KllQuantiles(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("within_rank5")))
    assert(rows.map(_.getAs[String]("grp")).contains("__all__"))
  }

  test("q151 versioned table: snapshot reads are isolated from later " +
      "commits, latest resolves, and missing versions raise") {
    import graft.sources.VersionedTable
    val base = s"/tmp/graft_vtspec_${java.util.UUID.randomUUID()}"
    val a = spark.range(0, 100).toDF("id")
    val b = spark.range(100, 150).toDF("id")
    val v0 = VersionedTable.commit(spark, a, base)
    assert(v0 == 0)
    val before = VersionedTable.read(spark, base, Some(0)).count()
    val v1 = VersionedTable.commit(spark, b, base, carryForward = true)
    assert(v1 == 1)
    // time travel: v0 must read byte-stable AFTER v1 landed
    assert(VersionedTable.read(spark, base, Some(0)).count() == before)
    assert(VersionedTable.read(spark, base, Some(0)).count() == 100)
    assert(VersionedTable.read(spark, base).count() == 150,
      "latest must resolve to v1's appended snapshot")
    // replace semantics: carryForward=false starts a fresh snapshot
    VersionedTable.commit(spark, b, base, carryForward = false)
    assert(VersionedTable.read(spark, base).count() == 50)
    assert(VersionedTable.read(spark, base, Some(1)).count() == 150,
      "older snapshots survive a replacing commit")
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, base, Some(99))
    }
    // VACUUM discovery: files on disk referenced by NO manifest are the
    // deletable set; removing them must not break any live snapshot.
    // After the replacing commit, no file became orphaned (v1 still
    // lists v0's files) — prove the audit finds nothing, then retire
    // manifests 0-1 and prove it finds exactly their exclusive files.
    def allDataFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(base))
        .filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).toSet
    }
    def referenced(versions: Seq[Int]): Set[String] =
      versions.flatMap(v => VersionedTable.filesOf(spark, base, v))
        .map(p => new java.net.URI(p).getPath).toSet // manifests hold
        // fully-qualified paths; compare on the path component
    assert(allDataFiles().diff(referenced(Seq(0, 1, 2))).isEmpty,
      "no orphans while every manifest is live")
    val orphansAfterRetire = allDataFiles().diff(referenced(Seq(2)))
    assert(orphansAfterRetire.nonEmpty,
      "retiring v0/v1 must expose v0's files as vacuum candidates")
    orphansAfterRetire.foreach(p => new java.io.File(p).delete())
    assert(VersionedTable.read(spark, base, Some(2)).count() == 50,
      "vacuum of orphans must not break the live snapshot")
  }

  test("versioned table: two committers publishing the same version — " +
      "exactly one wins the rename, the loser throws, the table keeps " +
      "serving the winner") {
    import graft.sources.VersionedTable
    val base = s"/tmp/graft_vtrace_${java.util.UUID.randomUUID()}"
    val winner = spark.range(0, 40).toDF("id")
    val loser = spark.range(1000, 1010).toDF("id")
    assert(VersionedTable.commitAs(spark, winner, base, 0,
      carryForward = false) == 0)
    // same explicit version: the loser's data lands under its own
    // nonce dir, then its manifest rename hits the existing 0.txt
    intercept[IllegalStateException] {
      VersionedTable.commitAs(spark, loser, base, 0, carryForward = false)
    }
    assert(VersionedTable.latestVersion(spark, base).contains(0))
    assert(VersionedTable.read(spark, base).count() == 40,
      "table must keep serving the winner's snapshot")
    // the loser's orphaned data dir is vacuum's problem, not a reader's —
    // but NOT inside the grace window: a young unreferenced dir is
    // indistinguishable from an in-flight commit that has written data
    // and not yet renamed its manifest, so default-grace vacuum must
    // leave it alone (deleting it would tear the racing snapshot)
    assert(VersionedTable.vacuum(spark, base, keep = 1).isEmpty,
      "a just-written unreferenced dir sits inside the commit grace " +
        "window and must survive default-grace vacuum")
    val reclaimed = VersionedTable.vacuum(spark, base, keep = 1, graceMs = 0L)
    assert(reclaimed.nonEmpty, "vacuum must reclaim the lost commit")
    assert(VersionedTable.read(spark, base).count() == 40)
  }

  test("versioned table vacuum: retained versions all serve after the " +
      "reclaim, carried-forward files survive via any live reference, " +
      "below-horizon reads fail loudly, numbering continues") {
    import graft.sources.VersionedTable
    val base = s"/tmp/graft_vtvac_${java.util.UUID.randomUUID()}"
    val a = spark.range(0, 100).toDF("id")
    val b = spark.range(100, 150).toDF("id")
    VersionedTable.commit(spark, a, base) // v0
    VersionedTable.commit(spark, b, base, carryForward = true) // v1 = a+b
    VersionedTable.commit(spark, b, base, carryForward = false) // v2 = b
    // keep=2 retains v1, v2; v0's files are still referenced by v1's
    // carry-forward manifest, so NOTHING is deletable yet
    assert(VersionedTable.vacuum(spark, base, keep = 2, graceMs = 0L).isEmpty,
      "carried-forward files are live while any retainer references them")
    assert(VersionedTable.read(spark, base, Some(1)).count() == 150)
    assert(VersionedTable.read(spark, base, Some(2)).count() == 50)
    intercept[IllegalArgumentException] { // v0's manifest is retired
      VersionedTable.read(spark, base, Some(0))
    }
    // keep=1 retains only v2 (fresh snapshot): v0+v1 files reclaim
    val reclaimed = VersionedTable.vacuum(spark, base, keep = 1, graceMs = 0L)
    assert(reclaimed.nonEmpty)
    reclaimed.foreach(p => assert(
      !new java.io.File(new java.net.URI(p).getPath).exists(),
      s"$p should be gone"))
    assert(VersionedTable.read(spark, base).count() == 50,
      "the retained snapshot serves after vacuum")
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, base, Some(1))
    }
    assert(VersionedTable.commit(spark, a, base) == 3,
      "version numbering continues past vacuumed history")
    assert(VersionedTable.read(spark, base).count() == 150)
  }

  test("q162 compaction: 32 fragments rewrite to 4 files with " +
      "identical content, vacuum reclaims every fragment, the retired " +
      "version fails loudly") {
    import graft.sources.VersionedTable
    val base = s"/tmp/graft_q162spec_${java.util.UUID.randomUUID()}"
    val df = spark.range(0, 1000).toDF("id")
    VersionedTable.commit(spark, df.repartition(32), base,
      carryForward = false)
    assert(VersionedTable.filesOf(spark, base, 0).size == 32)
    val before = VersionedTable.read(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq
    val v1 = VersionedTable.compact(spark, base, targetFiles = 4)
    assert(v1 == 1)
    assert(VersionedTable.filesOf(spark, base, 1).size == 4,
      "compaction must land exactly targetFiles files")
    val after = VersionedTable.read(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before, "compaction must be content-lossless")
    val reclaimed = VersionedTable.vacuum(spark, base, keep = 1, graceMs = 0L)
    assert(reclaimed.size == 32, s"expected all 32 fragments reclaimed, " +
      s"got ${reclaimed.size}")
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, base, Some(0))
    }
    assert(VersionedTable.read(spark, base).count() == 1000)
  }

  test("q164 shallow clone: zero bytes copied, clone commits diverge " +
      "without touching the source, clone vacuum never reclaims " +
      "source files") {
    import graft.sources.VersionedTable
    val stamp = java.util.UUID.randomUUID().toString
    val a = s"/tmp/graft_q164spec_a_$stamp"
    val b = s"/tmp/graft_q164spec_b_$stamp"
    VersionedTable.commit(spark, spark.range(0, 100).toDF("id"), a,
      carryForward = false)
    VersionedTable.shallowClone(spark, a, b)
    // zero-copy: the clone's root holds ONLY a manifest dir
    assert(!new java.io.File(b).listFiles()
      .exists(_.getName.startsWith("files-v")),
      "clone must not copy any data directory")
    assert(VersionedTable.read(spark, b).count() == 100)
    VersionedTable.commit(spark, spark.range(100, 150).toDF("id"), b,
      carryForward = true)
    assert(VersionedTable.read(spark, b).count() == 150)
    assert(VersionedTable.read(spark, a).count() == 100,
      "the source must not see the clone's commits")
    // clone-side vacuum sweeps only the clone's own files-v* dirs:
    // borrowed source references are structurally out of reach
    VersionedTable.vacuum(spark, b, keep = 1, graceMs = 0L)
    assert(VersionedTable.read(spark, a).count() == 100)
    assert(VersionedTable.read(spark, b).count() == 150)
  }

  test("q126 dynamic overwrite: only delta partitions are replaced " +
      "(static mode truncates the table), and re-landing the delta is " +
      "idempotent") {
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val nSources = docs.select(col("source")).distinct().count()
    val base = s"/tmp/graft_q126spec_${java.util.UUID.randomUUID()}"
    docs.write.mode("overwrite").partitionBy("source").parquet(base)
    val delta = docs.filter(col("source") === "src3")
      .withColumn("n_chars", col("n_chars") + lit(7L))
    def land(): Unit = delta.write.mode("overwrite")
      .partitionBy("source").option("partitionOverwriteMode", "dynamic")
      .parquet(base)
    land()
    val merged = spark.read.parquet(base)
    assert(merged.select(col("source")).distinct().count() == nSources,
      "dynamic overwrite must leave untouched partitions in place")
    val total1 = merged.agg(sum(col("n_chars"))).head().getLong(0)
    land() // crash-replay: same delta again
    val total2 = spark.read.parquet(base)
      .agg(sum(col("n_chars"))).head().getLong(0)
    assert(total1 == total2, "re-landing the same delta must be a no-op")
    // static overwrite on the same path drops every other partition —
    // the failure mode dynamic mode exists to prevent
    delta.write.mode("overwrite").partitionBy("source").parquet(base)
    assert(spark.read.parquet(base)
      .select(col("source")).distinct().count() == 1)
  }

  test("b40 motion energy: one row per consecutive frame pair, both " +
      "cut-flag values appear, and a hand-computed cell matches") {
    val rows = BioQueries.b40MotionEnergy(spark, sf).collect()
    assert(rows.length == 2 * 3, s"2 channels x 3 frame pairs: got $rows")
    assert(rows.map(_.getAs[Boolean]("cut")).toSet == Set(true, false),
      "the t² motion ramp must produce both flag values")
    // hand-compute c=0, t=1: sum over y,x of |px(0,1,y,x) - px(0,0,y,x)|
    def px(c: Int, t: Int, y: Int, x: Int): Double =
      ((c * 13 + t * t * 7 + y * 5 + x * 3) % 29).toDouble
    val expect = (for (y <- 0 until 4; x <- 0 until 5)
      yield math.abs(px(0, 1, y, x) - px(0, 0, y, x))).sum
    val got = rows.find(r => r.getAs[Long]("c") == 0 &&
      r.getAs[Long]("t") == 1).get
    assert(got.getAs[Double]("sum_abs") == expect,
      s"sum_abs: got $got expected $expect")
  }

  test("q105 token emission: the native ShingleGenerate GENERATOR plans " +
      "inside a WholeStageCodegen span and is bit-compatible with " +
      "explode(array_distinct(split))") {
    val df = TextOps.q105InvertedIndex(spark, sf)
    df.collect()
    val genLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(l => l.contains("Generate") &&
        l.contains("shinglegenerate")).getOrElse("")
    assert(genLine.nonEmpty, "q105 must plan the native generator")
    assert(genLine.contains("*("),
      s"Generate must sit inside a WholeStageCodegen span, got: $genLine")
    // bit-compatibility at n=2: generator rows == explode(array_distinct)
    // of the HOF shingle build, same multiset
    val docs = graft.Tables(spark, sf, "documents").limit(50)
    val viaGen = docs.select(col("doc_id"),
        graft.functions.ShingleGenerate(col("text"), 2).as("sh"))
      .orderBy("doc_id", "sh").collect().toSeq
    val viaExplode = docs.select(col("doc_id"),
        explode(graft.functions.WordShingles(col("text"), 2)).as("sh"))
      .orderBy("doc_id", "sh").collect().toSeq
    assert(viaGen == viaExplode && viaGen.nonEmpty)
    // SQL registration via SparkSessionExtensions
    val sqlRows = spark.sql("SELECT shingle_gen('a b a c', 1) AS t")
      .collect().map(_.getString(0)).toSeq
    assert(sqlRows == Seq("a", "b", "c"),
      s"shingle_gen SQL form must emit distinct first-seen rows, got $sqlRows")
  }

  test("q173 unigram-LM: hard-EM Viterbi loss DECREASES across the two " +
      "E/M rounds, and the learned pieces respect the length cap") {
    val out = TextOps.unigramLmCore(spark, sf).collect()
    assert(out.length == 20)
    val l1 = out.head.getAs[Long]("loss1")
    val l2 = out.head.getAs[Long]("loss2")
    assert(l2 < l1,
      s"re-estimated model must fit the corpus strictly better on this " +
        s"fixture: loss1=$l1 loss2=$l2")
    out.foreach { r =>
      val p = r.getAs[String]("piece")
      assert(p.length >= 1 && p.length <= 4, s"piece length cap: '$p'")
      assert(r.getAs[Long]("est_cnt") > 0)
    }
    assert(out.map(_.getAs[String]("piece")).distinct.length == 20)
  }
}
