package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec

/** Shredded-JSON storage ([[LakeJsonShred]]): declared paths parse
  * once at ingest into hidden columns; `get_json_object` over them
  * rewrites to a plain columnar read that prunes the raw string away;
  * the rewrite is gated on every file carrying the columns and
  * answers never depend on the gate. */
class GraftLakeJsonShredSpec extends SparkSpec {

  private val n = new AtomicInteger(0)

  private def freshCatalog(): (String, String) = {
    val cat = s"glc_shred_${n.incrementAndGet()}"
    val root = s"/tmp/graft_lake_shred_${java.util.UUID.randomUUID()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def readSchemaOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("ReadSchema")).mkString("|")

  test("declared paths serve from shredded columns; raw string prunes away") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.e (id BIGINT, props STRING) " +
      "TBLPROPERTIES('graft.json.shred'='props:$.plan,$.count')")
    spark.sql(s"""INSERT INTO $cat.e VALUES
      | (1, '{"plan": "pro", "count": 3, "x": 1}'),
      | (2, '{"plan": "free", "count": 5}'),
      | (3, '{"count": 9}'),
      | (4, NULL)""".stripMargin)
    val q = spark.sql(s"SELECT get_json_object(props, '$$.plan') AS p, " +
      s"CAST(get_json_object(props, '$$.count') AS BIGINT) AS c " +
      s"FROM $cat.e ORDER BY id")
    val got = q.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) null else r.getLong(1))).toSeq
    assert(got === Seq(("pro", 3L), ("free", 5L), (null, 9L),
      (null, null)), s"got $got")
    // the gate: the shredded plan reads ONLY the shredded columns
    val rs = readSchemaOf(q)
    assert(rs.contains("__shred_plan") && rs.contains("__shred_count"),
      s"expected shredded reads, got $rs")
    assert(!rs.contains("props"), s"raw column must prune away: $rs")
    // a NON-declared path still parses the raw string
    val other = spark.sql(
      s"SELECT get_json_object(props, '$$.x') AS x FROM $cat.e " +
        "WHERE id = 1")
    assert(other.collect()(0).getString(0) === "1")
    assert(readSchemaOf(other).contains("props"))
    // SELECT * stays clean of internals
    assert(!spark.table(s"$cat.e").columns
      .exists(LakeJsonShred.isShredCol))
  }

  test("gate degrades on unshredded files and compaction re-earns it; answers never change") {
    import spark.implicits._
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.e (id BIGINT, props STRING) " +
      "TBLPROPERTIES('graft.json.shred'='props:$.k')")
    spark.sql(s"""INSERT INTO $cat.e VALUES
      | (1, '{"k": "a"}'), (2, '{"k": "b"}')""".stripMargin)
    def q() = spark.sql(
      s"SELECT id, get_json_object(props, '$$.k') AS k FROM $cat.e " +
        "ORDER BY id")
    assert(readSchemaOf(q()).contains("__shred_k"))
    // an upsert lands an UN-shredded file: the rewrite must back off
    VersionedTable.upsertByKeysMergeOnRead(spark, s"$root/e",
      Seq((3L, """{"k": "c"}""")).toDF("id", "props"), Seq("id"))
    val degraded = q()
    assert(!readSchemaOf(degraded).contains("__shred_k"),
      "rewrite must not fire over files missing the shredded column")
    assert(degraded.collect().map(_.getString(1)).toSeq ===
      Seq("a", "b", "c"))
    // compaction re-materializes (commit path shreds) — rewrite back on
    spark.sql(s"CALL $cat.system.compact(table => 'e')")
    val healed = q()
    assert(readSchemaOf(healed).contains("__shred_k"),
      s"compact must re-earn the shredded plan: ${readSchemaOf(healed)}")
    assert(healed.collect().map(_.getString(1)).toSeq ===
      Seq("a", "b", "c"))
  }

  test("filters push onto the shredded column") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.e (id BIGINT, props STRING) " +
      "TBLPROPERTIES('graft.json.shred'='props:$.plan')")
    spark.sql(s"""INSERT INTO $cat.e VALUES
      | (1, '{"plan": "pro"}'), (2, '{"plan": "free"}'),
      | (3, '{"plan": "pro"}')""".stripMargin)
    val q = spark.sql(s"SELECT id FROM $cat.e " +
      s"WHERE get_json_object(props, '$$.plan') = 'pro' ORDER BY id")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("__shred_plan") && !plan.contains("props"),
      s"filter must run on the shredded column: $plan")
  }
}
