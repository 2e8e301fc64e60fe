package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for the native as-of join (logical node + strategy + physical
  * merge operator): semantics on a hand-computable micro case including
  * ties/no-match/empty-right, row-for-row agreement with q26's
  * union+window compositional form on real data, and the plan shape
  * (AsOfJoinExec present, exactly one exchange per side). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def asDf(rows: Seq[(Long, Long)], k: String, t: String) =
    rows.toDF(k, t)

  test("micro case: latest-at-or-before semantics, same-time tie " +
      "matches, missing key null-extends") {
    val left = asDf(Seq((1L, 10L), (1L, 20L), (2L, 5L)), "k", "t")
    val right = asDf(Seq((1L, 10L), (1L, 15L), (3L, 1L)), "rk", "rt")
    val got = AsOfJoin(left, right, "k", "t", "rk", "rt")
      .select(col("k"), col("t"), col("rt"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((1L, 10L, 10L), (1L, 20L, 15L), (2L, 5L, -1L)))
  }

  test("empty right side null-extends every left row") {
    val left = asDf(Seq((1L, 10L), (2L, 20L)), "k", "t")
    val right = asDf(Seq.empty[(Long, Long)], "rk", "rt")
    val got = AsOfJoin(left, right, "k", "t", "rk", "rt").collect()
    assert(got.length == 2 && got.forall(_.isNullAt(2)))
  }

  test("null right keys/times are unmatchable and skipped, null left " +
      "key null-extends") {
    val left = Seq((Some(1L), 10L), (None, 20L))
      .toDF("k", "t").select(col("k").cast("long").as("k"), col("t"))
    val right = Seq((Some(1L), Some(5L)), (Some(1L), None),
        (None, Some(1L)))
      .toDF("rk", "rt").select(col("rk").cast("long").as("rk"),
        col("rt").cast("long").as("rt"))
    val got = AsOfJoin(left, right, "k", "t", "rk", "rt")
      .select(col("t"), col("rt")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(got == Set((10L, 5L), (20L, -1L)))
  }

  test("tolerance: a key-matching right row older than the bound " +
      "null-extends; a fresh one still matches; exactly-at-bound " +
      "matches") {
    val left = asDf(Seq((1L, 100L), (1L, 13L), (1L, 10L)), "k", "t")
    val right = asDf(Seq((1L, 5L), (1L, 8L)), "rk", "rt")
    val got = AsOfJoin(left, right, "k", "t", "rk", "rt", Some(5L))
      .select(col("t"), col("rt")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    // t=10: held 8, 10-8=2 <= 5 -> match. t=13: 13-8=5 <= 5 -> match
    // (inclusive bound). t=100: 100-8 > 5 -> stale, null.
    assert(got == Set((10L, 8L), (13L, 8L), (100L, -1L)))
  }

  test("q123 native as-of agrees row-for-row with q26's union+window " +
      "compositional form") {
    val sfDir = "/root/testdata/sf0.001"
    val native = graft.ops.EventOps.q123NativeAsOf(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val composed = graft.ops.EventOps.q26AsOfJoin(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(native.nonEmpty && native == composed)
  }

  test("plan shape: AsOfJoinExec planned via the injected strategy, " +
      "one exchange and one sort per side, declared not hand-built") {
    val df = graft.ops.EventOps.q123NativeAsOf(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix: the node prints AsOfJoin
    assert(plan.contains("AsOfJoin "), s"strategy not applied:\n$plan")
    // the final orderBy adds its own exchange; the join itself must
    // contribute exactly two (one per side). AQE's toString repeats the
    // initial plan below the final one — count only the final section.
    val finalSection = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange".r.findAllIn(finalSection).length
    assert(exchanges <= 3,
      s"unexpected exchange count $exchanges:\n$finalSection")
  }

  test("pre-bucketed (key)-sorted tables satisfy the declared " +
      "requirements exchange-free AND sort-free") {
    val n = 4
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"),
      (7L, 9L, "d")).toDF("k", "t", "pay")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 101L), (2L, 9L, 102L),
      (3L, 1L, 103L)).toDF("rk", "rt", "v")
    // repartition(n, key) uses the same pmod(murmur3) as bucketBy(n,
    // key), so each task holds exactly one bucket -> one file per
    // bucket -> the scan reports both the hash partitioning AND the
    // (key, time) sort order, and EnsureRequirements plans NOTHING.
    // Sort-order propagation from sorted buckets moved behind a legacy
    // flag in Spark 3 (multi-file buckets read concatenated, so the
    // default stopped trusting it); with one file per bucket it is
    // sound, and turning it on is what makes the scan satisfy
    // requiredChildOrdering too — zero exchanges AND zero sorts.
    spark.conf.set(
      "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    left.repartition(n, col("k")).write.mode("overwrite")
      .bucketBy(n, "k").sortBy("k", "t").saveAsTable("asof_buck_l")
    right.repartition(n, col("rk")).write.mode("overwrite")
      .bucketBy(n, "rk").sortBy("rk", "rt").saveAsTable("asof_buck_r")
    try {
      val j = AsOfJoin(spark.table("asof_buck_l"),
        spark.table("asof_buck_r"), "k", "t", "rk", "rt")
      val got = j.select(col("k"), col("t"), col("v")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(got == Set((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, -1L),
        (7L, 9L, -1L)))
      val plan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("AsOfJoin "), s"strategy not applied:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed as-of should plan zero exchanges:\n$plan")
      assert(!plan.contains("Sort ["),
        s"bucketed sorted as-of should plan zero sorts:\n$plan")
    } finally {
      spark.conf.unset(
        "spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS asof_buck_l")
      spark.sql("DROP TABLE IF EXISTS asof_buck_r")
    }
  }

  test("facade validates column names and the LongType contract") {
    val left = asDf(Seq((1L, 10L)), "k", "t")
    val right = asDf(Seq((1L, 10L)), "rk", "rt")
    intercept[IllegalArgumentException] {
      AsOfJoin(left, right, "nope", "t", "rk", "rt")
    }
    val strKey = Seq(("a", 1L)).toDF("rk", "rt")
    intercept[IllegalArgumentException] {
      AsOfJoin(left, strKey, "k", "t", "rk", "rt")
    }
  }
}
