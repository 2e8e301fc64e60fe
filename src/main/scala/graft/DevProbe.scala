package graft

/** Throwaway dev probe: print the formatted physical plans of the
  * round-4 queries for shuffle/broadcast auditing. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-probe")
    for (name <- args.toSeq match {
      case Seq() => Seq("q55_ivfpq_probe", "q57_chunk_dedup")
      case names  => names
    }) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    // q52's CC loop plans per-iteration; show the pair-pipeline input and
    // one propagation round instead
    println("========== q52 pair input ==========")
    import org.apache.spark.sql.functions._
    val pairs = ops.DedupOps.jaccardPairsCore(spark, sfDir)
      .filter(col("jaccard") >= 0.6).select(col("doc_a"), col("doc_b"))
    pairs.explain("formatted")
    spark.stop()
  }
}
