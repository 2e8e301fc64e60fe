package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Throwaway dev probe for stage-level timing. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-probe")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val d = Tables.balanced(spark, sfDir, "documents")
      .select(col("doc_id"), DedupOps.shingles3(col("text")).as("sh"))

    time("shingles materialize")(
      d.write.format("noop").mode("overwrite").save())
    val nDocs = time("count docs")(d.count())
    val avgSh = time("avg shingles")(
      d.select(avg(size(col("sh")))).head().getDouble(0))
    println(s"[probe] docs=$nDocs avgShingles=$avgSh")

    val sigDf = d.filter(size(col("sh")) > 0)
      .withColumn("shh", transform(col("sh"), s => xxhash64(s)))
      .withColumn("sig", DedupOps.minhashSignature(col("shh"), 32))
      .select("doc_id", "sig")
    println(s"[probe] sig partitions=${sigDf.rdd.getNumPartitions}")
    time("signatures materialize")(
      sigDf.write.format("noop").mode("overwrite").save())
    time("q41 simhash")(
      DedupOps.q41SimHash(spark, sfDir)
        .write.format("noop").mode("overwrite").save())

    val cands = DedupOps.lshCandidates(d, 32, 8)
    val n = time("lshCandidates count")(cands.count())
    println(s"[probe] candidate pairs=$n")

    time("full q40")(
      DedupOps.q40MinHashLsh(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
