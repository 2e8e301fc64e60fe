package graft

import org.apache.spark.sql.DataFrame

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{name:sec,...}}.
  *
  * Each query is fully materialized through the noop sink (forces every
  * operator to run, unlike count() which can prune to a metadata-only
  * scan). One untimed warm-up of the smallest query amortizes JVM/codegen
  * startup out of the per-query numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up: JIT + codegen + parquet footer caches
    try materialize(SparkEntry.queries("q20_distinct")(spark, sfDir))
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try materialize(fn(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
