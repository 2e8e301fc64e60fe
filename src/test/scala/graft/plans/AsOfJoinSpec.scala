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
