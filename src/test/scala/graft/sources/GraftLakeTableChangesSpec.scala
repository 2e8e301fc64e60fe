package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch incremental read ([[VersionedTable.tableChanges]], Delta's
  * `table_changes(from, to)`): per-version commit-log deltas as one
  * batch DataFrame, inclusive range bounds, stream-equal semantics. */
class GraftLakeTableChangesSpec extends SparkSpec {

  private val n = new AtomicInteger(0)

  private def freshDir(): String =
    s"/tmp/graft_tc_${java.util.UUID.randomUUID()}"

  test("inclusive range bounds slice the feed by commit") {
    import spark.implicits._
    val dir = freshDir()
    VersionedTable.commit(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)            // v0
    VersionedTable.commit(spark,
      Seq((3L, "c")).toDF("k", "v"), dir)                       // v1
    VersionedTable.deleteWhere(spark, dir, col("k") === 1L)     // v2
    val full = VersionedTable.tableChanges(spark, dir, 0)
    val byV = full.collect()
      .groupBy(_.getInt(full.columns.indexOf("_commit_version")))
      .view.mapValues(_.map(r =>
        (r.getLong(0), r.getString(full.columns.indexOf("_change_type"))))
        .toSet).toMap
    assert(byV(0) === Set((1L, "insert"), (2L, "insert")))
    assert(byV(1) === Set((3L, "insert")))
    // COW delete: the touched file's live rows emit as deletes, its
    // survivors re-emit as inserts (rewrite churn — the CDF contract)
    assert(byV(2).contains((1L, "delete")))
    // range [1, 1]: exactly v1's delta
    val mid = VersionedTable.tableChanges(spark, dir, 1, Some(1))
    assert(mid.collect().map(r => (r.getLong(0),
      r.getString(mid.columns.indexOf("_change_type")))).toSet ===
      Set((3L, "insert")))
    // empty range past head refuses loudly
    intercept[IllegalArgumentException] {
      VersionedTable.tableChanges(spark, dir, 5, Some(4))
    }
  }

  test("merge-on-read deletes emit deleted CONTENT; feed folds back to state") {
    import spark.implicits._
    val dir = freshDir()
    VersionedTable.commit(spark,
      (0 until 10).map(i => (i.toLong, i * 10L)).toDF("k", "v"), dir)
    VersionedTable.deleteWhereMergeOnRead(spark, dir, col("k") < 3L)
    VersionedTable.upsertByKeysMergeOnRead(spark, dir,
      Seq((5L, 555L)).toDF("k", "v"), Seq("k"))
    val feed = VersionedTable.tableChanges(spark, dir, 0)
    // fold: inserts add, deletes subtract — must equal the live view
    val folded = feed.agg(sum(when(
      col("_change_type").isin("insert", "update_postimage"),
      col("v")).otherwise(-col("v")))).collect()(0).getLong(0)
    val actual = VersionedTable.read(spark, dir)
      .agg(sum("v")).collect()(0).getLong(0)
    assert(folded === actual, s"fold $folded != state $actual")
    // the MoR delete's content arrived as rows, not positions
    val deleted = feed.filter(col("_change_type") === "delete" &&
      col("_commit_version") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(deleted === Set((0L, 0L), (1L, 10L), (2L, 20L)))
  }

  test("batch feed equals the drained stream over identical commits") {
    import spark.implicits._
    val dir = freshDir()
    VersionedTable.commit(spark,
      (0 until 20).map(i => (i.toLong, i.toLong)).toDF("k", "v"), dir)
    VersionedTable.upsertByKeysMergeOnRead(spark, dir,
      Seq((7L, 777L), (100L, 100L)).toDF("k", "v"), Seq("k"))
    VersionedTable.deleteWhereMergeOnRead(spark, dir, col("k") >= 18L)
    val batch = VersionedTable.tableChanges(spark, dir, 0)
    val streamed = graft.streaming.StreamOps.runToMemory(spark,
      VersionedTable.changeFeedStream(spark, dir),
      s"tc_eq_${n.incrementAndGet()}", "append")
      .select(batch.columns.map(col): _*)
    assert(batch.exceptAll(streamed).isEmpty &&
      streamed.exceptAll(batch).isEmpty,
      "batch table_changes diverged from the streamed feed")
  }
}
