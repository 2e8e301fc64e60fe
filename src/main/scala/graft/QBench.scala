package graft

/** Dev utility: time (and optionally explain) a subset of the declared
  * queries. Usage: runMain graft.QBench [-explain] q40_minhash_lsh ...
  * SF dir from SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = args.contains("-explain")
    val names = args.filterNot(_.startsWith("-"))
    val spark = GraftSession.local("graft-qbench")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      if (explain) df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[qbench] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
