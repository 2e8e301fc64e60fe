package graft

import org.apache.spark.sql.SparkSession

/** Dev utility (r17 task #4/#3): per-PHASE wall times of the DML
  * lifecycle keys the r16 verdict flagged (q177/q179 creep vs r13,
  * q217's 32c-vs-8c anomaly). Each phase is one SQL statement of the
  * corresponding declared query, timed individually after a full
  * warm-up pass of the same lifecycle, so the numbers split commit cost
  * from query cost instead of guessing. Usage:
  *   SPARK_GRAFT_SF_DIR=... runMain graft.DmlProbe [q177|q179|q217] [reps]
  */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = args.headOption.getOrElse("q177")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("graft-dmlprobe")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dmlprobe] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    def lifecycle(run: Boolean): Unit = which match {
      case "q177" =>
        val nonce = java.util.UUID.randomUUID().toString
          .replace("-", "").take(12)
        val cat = s"graft_lake_$nonce"
        spark.conf.set(s"spark.sql.catalog.$cat",
          "graft.sources.GraftLakeCatalog")
        spark.conf.set(s"spark.sql.catalog.$cat.root",
          s"/tmp/graft_q177p_$nonce")
        Tables(spark, sfDir, "orders").createOrReplaceTempView("q177p_src")
        def ph[A](l: String)(f: => A): A =
          if (run) timed(l)(f) else f
        ph("ctas") { spark.sql(s"CREATE TABLE $cat.orders_v AS " +
          "SELECT * FROM q177p_src WHERE o_orderkey % 4 <> 0") }
        ph("update") { spark.sql(s"UPDATE $cat.orders_v " +
          "SET o_totalprice = o_totalprice + 1000.0 " +
          "WHERE o_orderstatus = 'F'") }
        ph("merge") { spark.sql(
          s"""MERGE INTO $cat.orders_v AS t
             |USING (SELECT * FROM q177p_src WHERE o_orderkey % 2 = 0) AS s
             |ON t.o_orderkey = s.o_orderkey
             |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
             |WHEN NOT MATCHED THEN INSERT *
             |""".stripMargin) }
        def fp(v: Long): String =
          s"""SELECT CAST($v AS BIGINT) AS version, count(*) AS n_rows,
             |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
             |  round(sum(o_totalprice), 2) AS total
             |FROM $cat.orders_v VERSION AS OF $v""".stripMargin
        ph("read3versions") { spark.sql(
          s"""SELECT * FROM (${fp(1)} UNION ALL ${fp(2)} UNION ALL ${fp(3)}
             |) ORDER BY version""".stripMargin)
          .write.format("noop").mode("overwrite").save() }
      case "q179" =>
        val nonce = java.util.UUID.randomUUID().toString
          .replace("-", "").take(12)
        val cat = s"graft_lake_$nonce"
        spark.conf.set(s"spark.sql.catalog.$cat",
          "graft.sources.GraftLakeCatalog")
        spark.conf.set(s"spark.sql.catalog.$cat.root",
          s"/tmp/graft_q179p_$nonce")
        val o = Tables(spark, sfDir, "orders")
        import org.apache.spark.sql.functions._
        val cut = lit("1997-01-01 00:00:00").cast("timestamp_ntz")
        o.filter(col("o_orderdate") < cut)
          .createOrReplaceTempView("q179p_pre")
        o.filter(col("o_orderdate") >= cut)
          .createOrReplaceTempView("q179p_post")
        o.filter(col("o_orderstatus") === "F")
          .createOrReplaceTempView("q179p_f")
        def ph[A](l: String)(f: => A): A =
          if (run) timed(l)(f) else f
        ph("ctas") { spark.sql(
          s"CREATE TABLE $cat.orders_v AS SELECT * FROM q179p_pre") }
        ph("insert") { spark.sql(
          s"INSERT INTO $cat.orders_v SELECT * FROM q179p_post") }
        ph("insert_overwrite") { spark.sql(
          s"INSERT OVERWRITE $cat.orders_v SELECT * FROM q179p_f") }
        ph("versions_meta") { spark.sql(
          s"""SELECT version, total_rows, n_files >= 1 AS files_ok
             |FROM $cat.orders_v.versions ORDER BY version""".stripMargin)
          .write.format("noop").mode("overwrite").save() }
      case "q217" =>
        val nonce = java.util.UUID.randomUUID().toString
          .replace("-", "").take(12)
        val cat = s"graft_lakehg_$nonce"
        spark.conf.set(s"spark.sql.catalog.$cat",
          "graft.sources.GraftLakeCatalog")
        spark.conf.set(s"spark.sql.catalog.$cat.root",
          s"/tmp/graft_q217p_$nonce")
        Tables(spark, sfDir, "customer")
          .selectExpr(
            """CASE WHEN c_custkey % 100 <> 0 THEN c_custkey % 100
              |  ELSE 5000 + (c_custkey % 5000) DIV 100 * 100
              |END AS k""".stripMargin, "c_acctbal")
          .createOrReplaceTempView(s"q217p_src")
        Tables(spark, sfDir, "orders")
          .selectExpr("o_orderkey % 10000 AS fk", "o_totalprice")
          .createOrReplaceTempView(s"q217p_fact")
        def ph[A](l: String)(f: => A): A =
          if (run) timed(l)(f) else f
        ph("create2") {
          spark.sql(s"CREATE TABLE $cat.dim (k BIGINT, c_acctbal DOUBLE) " +
            "TBLPROPERTIES('graft.ndv.columns'='k', " +
            "'graft.histogram.columns'='k')")
          spark.sql(s"CREATE TABLE $cat.ctl (k BIGINT, c_acctbal DOUBLE) " +
            "TBLPROPERTIES('graft.ndv.columns'='k')") }
        ph("insert_dim") {
          spark.sql(s"INSERT INTO $cat.dim SELECT * FROM q217p_src") }
        ph("insert_ctl") {
          spark.sql(s"INSERT INTO $cat.ctl SELECT * FROM q217p_src") }
        val saved = Seq("spark.sql.cbo.enabled",
          "spark.sql.autoBroadcastJoinThreshold")
          .map(k => k -> spark.conf.getOption(k))
        try {
          spark.conf.set("spark.sql.cbo.enabled", "true")
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "8192")
          def q(tab: String) = spark.sql(
            s"""SELECT count(*) AS n,
               |  round(sum(f.o_totalprice), 2) AS total
               |FROM q217p_fact f
               |JOIN (SELECT k FROM $cat.$tab WHERE k >= 4000) d
               |  ON f.fk = d.k""".stripMargin)
          ph("plan_dim") { q("dim").queryExecution.sparkPlan.toString }
          ph("plan_ctl") { q("ctl").queryExecution.sparkPlan.toString }
          ph("exec_dim") { q("dim").write.format("noop")
            .mode("overwrite").save() }
        } finally saved.foreach { case (k, v) =>
          v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      case "create" =>
        // fixed-overhead probe: N empty CREATEs on one catalog — what
        // does a zero-data commit cost, and where does the time go
        // (pair with jstack sampling from outside)
        val nonce = java.util.UUID.randomUUID().toString
          .replace("-", "").take(12)
        val cat = s"graft_lake_$nonce"
        spark.conf.set(s"spark.sql.catalog.$cat",
          "graft.sources.GraftLakeCatalog")
        spark.conf.set(s"spark.sql.catalog.$cat.root",
          s"/tmp/graft_createp_$nonce")
        if (run) (1 to 20).foreach { i =>
          timed(s"create_$i") {
            spark.sql(s"CREATE TABLE $cat.t$i (k BIGINT, v DOUBLE)") }
        }
      case other => sys.error(s"unknown probe $other")
    }

    println(s"[dmlprobe] $which warm-up lifecycle (untimed)")
    lifecycle(run = false)
    (1 to reps).foreach { i =>
      println(s"[dmlprobe] --- rep $i ---")
      lifecycle(run = true)
    }
    spark.stop()
  }
}
