package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided star schema (see /root/repo/TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst predicate pushdown and
  * column pruning reach the file source untouched.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }

  /** Read a table guaranteeing at least the session's default parallelism
    * of partitions. A Parquet row group is the minimum split unit, so a
    * small single-row-group file scans as ONE partition and pins every
    * downstream expression to one core — the harness's sf files are
    * exactly that shape. At production scale the scan already has ≥
    * parallelism row groups and this inserts NO shuffle; use it for
    * CPU-bound per-row work (hashing, shingling, signatures) where a
    * one-time round-robin of a small input is free relative to the
    * compute it unlocks. */
  def balanced(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = apply(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** events.ts is parquet TIMESTAMP(NANOS,false). Spark's finest timestamp
    * is microseconds, so we read the raw int64 nanos (legacy conf) and add:
    *   - ts_us:  microseconds since epoch (matches DuckDB, which truncates
    *             ns->us on read)
    *   - ts_utc: a proper TimestampType column for time-window/streaming ops
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts_us", expr("ts DIV 1000"))
      .withColumn("ts_utc", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Register every table as a temp view (for SQL-shaped operators:
    * grouping sets, SQL entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
