package graft.ops

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics over relationally-derived graphs — the
  * operator family behind link analysis, influence scoring and
  * graph-based data curation at corpus scale. Complements the label
  * propagation in [[DedupOps.connectedComponents]] (q52) with a
  * fixed-iteration PageRank.
  *
  * Determinism at any parallelism is the design center, as with q53's
  * k-means: ranks are ×10^6 fixed-point int64 and every per-edge
  * contribution is an integer ⌊rank/deg⌋, so partial-aggregation order
  * cannot change a single bit — float PageRank is irreproducible on a
  * cluster for the same reason float k-means is. The damping update is
  * r' = 150000 + ⌊85·Σcontrib/100⌋ (d = 0.85 at scale 10^6).
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q76
  /** PageRank (3 unrolled iterations) over the part co-purchase graph:
    * parts sharing an order are linked (the classic recommendation
    * graph). Central catalog parts surface with the highest rank.
    *
    * Scale shape: edge generation is ONE self-equi-join on the order
    * key (never a cross join — pair count is bounded by Σ per-order
    * line-count², ~7² per order); each iteration is one hash join of
    * the static degree-annotated edge list against the current ranks
    * plus one aggregation, both shuffling on the SAME part-key columns,
    * so at scale the edge list is hash-partitioned once (bucketed by
    * src) and every iteration reuses that layout — the loop adds no new
    * wide dependency on the big side. Three fixed iterations keep the
    * plan static and the oracle expressible as unrolled CTE stages. */
  val q76PageRank: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    // The static edge list needs NO manual cache/checkpoint: because the
    // unrolled loop is one declarative plan, ReuseExchange dedupes the
    // repeated edge-subplan shuffles across iterations (9 ReusedExchange
    // nodes in the AQE final plan; an A/B against localCheckpoint
    // measured the checkpoint ~20% slower — it materializes what the
    // optimizer already shares). Iterate-until-convergence variants with
    // a DYNAMIC loop need the connectedComponents-style lineage cut.
    val e0 = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = edges.join(deg, "src")
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to 3) {
      ranks = ed.join(ranks, ed("src") === ranks("node"))
        .select(col("dst"), expr("r DIV deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          expr("150000 + (85 * s) DIV 100").as("r"))
    }
    ranks.orderBy(col("r").desc, col("node"))
      .limit(20)
      .select(col("node").as("part_id"), col("r").as("pr"))
  }

  val q76Oracle: String =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e0 AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |d AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      |ed AS (SELECT e.src, e.dst, d.deg FROM e JOIN d USING (src)),
      |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM d),
      |r1 AS (SELECT dst AS node, 150000 + ((85 * sum(r // deg)) // 100) AS r
      |  FROM ed JOIN r0 ON ed.src = r0.node GROUP BY dst),
      |r2 AS (SELECT dst AS node, 150000 + ((85 * sum(r // deg)) // 100) AS r
      |  FROM ed JOIN r1 ON ed.src = r1.node GROUP BY dst),
      |r3 AS (SELECT dst AS node, 150000 + ((85 * sum(r // deg)) // 100) AS r
      |  FROM ed JOIN r2 ON ed.src = r2.node GROUP BY dst)
      |SELECT node AS part_id, CAST(r AS BIGINT) AS pr
      |FROM r3 ORDER BY r DESC, node LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q77
  /** Triangle counting per node (the clustering-coefficient numerator /
    * graph-quality signal) with DEGREE-ORDERED ORIENTATION — the
    * standard O(m^1.5) technique: direct every edge from its
    * lower-(degree, id) endpoint to the higher one, so each triangle is
    * found exactly once by joining the oriented wedge (a→b, a→c) against
    * the oriented closing edge (b→c), and no high-degree hub ever fans
    * out a quadratic wedge set. Runs on the co-purchase subgraph of
    * parts < 2000 (a deterministic bound that keeps the per-round bench
    * stable; the plan is corpus-size-agnostic).
    *
    * Scale shape: two hash joins on node keys over the oriented edge
    * list — the wedge self-join fans out Σ out-deg² where out-degree is
    * capped by orientation at O(√m), and the closing join is an
    * equi-join back on the (b, c) edge key. */
  /** q77's per-node triangle counts before the presentation top-k —
    * split out so the spec can cross-check the oriented count against a
    * brute-force enumeration. */
  def triangleCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_partkey") < 2000)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e0 = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
    val und = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // orient u→v iff (deg, id) of u < (deg, id) of v; KEEP the head's
    // (deg, id) so the wedge can order its two endpoints in the SAME
    // total order — ordering them by raw id would probe closing edges
    // against the wrong orientation and silently drop triangles
    val dd = und
      .join(deg.withColumnRenamed("u", "du").withColumnRenamed("deg", "dgu"),
        col("u") === col("du"))
      .join(deg.withColumnRenamed("u", "dv").withColumnRenamed("deg", "dgv"),
        col("v") === col("dv"))
      .filter(col("dgu") < col("dgv") ||
        (col("dgu") === col("dgv") && col("u") < col("v")))
      .select(col("u"), col("v"), col("dgv"))
    val wedges = dd.as("x").join(dd.as("y"),
        col("x.u") === col("y.u") && (col("x.dgv") < col("y.dgv") ||
          (col("x.dgv") === col("y.dgv") && col("x.v") < col("y.v"))))
      .select(col("x.u").as("a"), col("x.v").as("b"), col("y.v").as("c"))
    val tris = wedges.join(dd.as("z"),
        col("b") === col("z.u") && col("c") === col("z.v"))
      .select(col("a"), col("b"), col("c"))
    // per-node triangle participation: each triangle credits all 3 nodes
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("part_id"))
      .groupBy(col("part_id"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  val q77Triangles: Q = (spark, dir) =>
    triangleCounts(spark, dir)
      .orderBy(col("n_triangles").desc, col("part_id"))
      .limit(20)

  val q77Oracle: String =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |  WHERE l_partkey < 2000),
      |e0 AS (SELECT DISTINCT a.pk AS u, b.pk AS v
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      |und AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      |d AS (SELECT u, count(*) AS deg FROM und GROUP BY u),
      |dd AS (SELECT und.u, und.v, dv.deg AS dgv FROM und
      |  JOIN d du ON und.u = du.u JOIN d dv ON und.v = dv.u
      |  WHERE du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)),
      |w AS (SELECT x.u AS a, x.v AS b, y.v AS c
      |  FROM dd x JOIN dd y ON x.u = y.u AND (x.dgv < y.dgv
      |    OR (x.dgv = y.dgv AND x.v < y.v))),
      |t AS (SELECT a, b, c FROM w
      |  JOIN dd z ON w.b = z.u AND w.c = z.v),
      |n AS (SELECT unnest([a, b, c]) AS part_id FROM t)
      |SELECT part_id, count(*) AS n_triangles
      |FROM n GROUP BY part_id
      |ORDER BY n_triangles DESC, part_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q88
  /** k-core decomposition (k = 3) of the high-quantity co-purchase
    * graph: iteratively peel nodes of degree < k until the remaining
    * subgraph is stable — the dense-core extraction behind graph-based
    * curation (keep the well-connected catalog/citation/link core, drop
    * the fringe). The high-quantity edge filter (l_quantity ≥ 40) keeps
    * the graph sparse enough that the peel actually bites.
    *
    * Scale shape: the static symmetric edge list is lineage-cut once
    * and every round is ONE self-semi-shaped join (edges against the
    * surviving-node set on both endpoints) plus one degree aggregate —
    * O(E)/round on the same node-key partitioning, exactly the
    * connectedComponents loop shape (q52), with the strictly decreasing
    * survivor count as the convergence scalar. Output is the core's
    * nodes with their induced (core) degree.
    *
    * The oracle unrolls 8 peel rounds; the fixpoint lands by round 6 at
    * both driver scale factors (measured) and extra rounds past the
    * fixpoint are identity, so the unroll has safe margin. */
  val q88KCore: Q = (spark, dir) => {
    val k = 3
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 40)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e0 = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
    val und = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint() // static across rounds — cut the pair pipeline
    val s0 = und.select(col("u")).distinct().localCheckpoint()
    var survivors = s0
    var lastDeg: DataFrame = null
    var n = survivors.count()
    var converged = false
    var round = 0
    while (!converged && round < 50) {
      val d = und
        .join(survivors.withColumnRenamed("u", "su"), col("u") === col("su"))
        .join(survivors.withColumnRenamed("u", "sv"), col("v") === col("sv"))
        .groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .localCheckpoint()
      val n2 = d.count()
      converged = n2 == n
      n = n2
      // free the superseded round's degree table the moment its
      // successor is materialized (deterministic, vs GC-lagged cleanup)
      if (lastDeg ne null) Checkpoints.release(lastDeg)
      lastDeg = d
      survivors = d.select(col("u"))
      round += 1
    }
    require(converged, s"k-core did not converge in $round rounds")
    // the oracle unrolls exactly 8 peel rounds; if the fixpoint ever
    // needs more, the gate would diverge with the engine still correct —
    // fail loudly here instead of silently breaching the unroll margin
    require(round <= 8,
      s"k-core fixpoint at round $round exceeds the oracle's 8-round unroll")
    Checkpoints.release(und)
    Checkpoints.release(s0)
    lastDeg.select(col("u").as("part_id"), col("d").cast("long").as("core_deg"))
      .orderBy(col("part_id"))
  }

  val q88Oracle: String = {
    val rounds = (1 to 8).map { i =>
      s"""s$i AS (SELECT e.u FROM und e
         |  JOIN s${i - 1} a ON e.u = a.u JOIN s${i - 1} b ON e.v = b.u
         |  GROUP BY e.u HAVING count(*) >= 3)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |  WHERE l_quantity >= 40),
       |e0 AS (SELECT DISTINCT a.pk AS u, b.pk AS v
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
       |und AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       |s0 AS (SELECT DISTINCT u FROM und),
       |$rounds
       |SELECT e.u AS part_id, CAST(count(*) AS BIGINT) AS core_deg
       |FROM und e JOIN s8 a ON e.u = a.u JOIN s8 b ON e.v = b.u
       |GROUP BY e.u ORDER BY part_id""".stripMargin
  }

  // ---------------------------------------------------------------- q99
  /** HITS hubs-and-authorities over the BIPARTITE customer↔part purchase
    * graph (who-buys-what, the two-mode graph PageRank's one-mode
    * projection destroys): two unrolled mutual-reinforcement rounds —
    * auth¹(p) = in-degree (hub⁰ ≡ 1), hub¹(c) = Σ auth¹ over c's parts,
    * auth²(p) = Σ hub¹ over p's buyers. Pure int64 edge sums, no
    * normalization inside the loop (the classic per-round L2 normalize
    * is float-irreproducible; rank ORDER is normalization-invariant, so
    * the deterministic integer form ranks identically), ties broken by
    * part key. q76's scale notes apply verbatim: each round is an
    * equi-join + aggregate on the SAME two key columns, so one bucketed
    * edge layout (by c, and by p) serves every round, and ReuseExchange
    * already dedupes the repeated edge shuffles in the unrolled plan. */
  val q99Hits: Q = (spark, dir) => {
    val e = Tables(spark, dir, "orders").select(
        col("o_orderkey").as("ok"), col("o_custkey").as("c"))
      .join(Tables(spark, dir, "lineitem").select(
        col("l_orderkey").as("ok"), col("l_partkey").as("p")), "ok")
      .select(col("c"), col("p")).distinct()
    val a1 = e.groupBy(col("p")).agg(count(lit(1)).as("auth1"))
    val h1 = e.join(a1, "p").groupBy(col("c"))
      .agg(sum(col("auth1")).as("hub1"))
    val a2 = e.join(h1, "c").groupBy(col("p"))
      .agg(sum(col("hub1")).as("auth2"))
    a1.join(a2, "p")
      .select(col("p").as("part_id"), col("auth1"), col("auth2"))
      .orderBy(col("auth2").desc, col("part_id")).limit(100)
  }

  val q99Oracle: String =
    """WITH e AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |a1 AS (SELECT p, count(*) AS auth1 FROM e GROUP BY p),
      |h1 AS (SELECT c, sum(auth1) AS hub1 FROM e JOIN a1 USING (p)
      |  GROUP BY c),
      |a2 AS (SELECT p, sum(hub1) AS auth2 FROM e JOIN h1 USING (c)
      |  GROUP BY p)
      |SELECT p AS part_id, CAST(auth1 AS BIGINT) AS auth1,
      | CAST(auth2 AS BIGINT) AS auth2
      |FROM a1 JOIN a2 USING (p)
      |ORDER BY auth2 DESC, part_id LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q103
  /** Market-basket association mining over order baskets: co-occurrence
    * count and LIFT for part pairs bought in the same order —
    * lift(a,b) = P(ab)/(P(a)P(b)) = n_ab·N / (n_a·n_b), reported ×100 in
    * integer floor division (float lift is merge-order-dependent via
    * nothing — the inputs are exact counts — but the ×100 DIV keeps the
    * column hash-exact anyway). Top pairs by support then lift, total
    * order pinned by the pair keys.
    *
    * Scale shape: the pair discovery is q77's bounded self-equi-join on
    * the ORDER key — Σ basket² work (baskets are ≤7 items here, a
    * structural bound), never corpus²; per-part support rides the same
    * distinct item set as one part-key aggregate joined back by
    * broadcast-size maps at any realistic part count; N is one scalar
    * crossJoin. */
  val q103BasketLift: Q = (spark, dir) => {
    val items = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val support = items.groupBy(col("p")).agg(count(lit(1)).as("n_p"))
    val nOrders = items.select(col("o")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 3)
    pairs
      .join(support.select(col("p").as("pa"), col("n_p").as("n_a")), "pa")
      .join(support.select(col("p").as("pb"), col("n_p").as("n_b")), "pb")
      .crossJoin(nOrders)
      .withColumn("lift_x100",
        expr("(100 * n_ab * n_orders) DIV (n_a * n_b)"))
      .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
        col("lift_x100"))
      .orderBy(col("n_ab").desc, col("lift_x100").desc, col("pa"),
        col("pb"))
      .limit(100)
  }

  val q103Oracle: String =
    """WITH i AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |  FROM lineitem),
      |s AS (SELECT p, count(*) AS n_p FROM i GROUP BY p),
      |n AS (SELECT count(DISTINCT o) AS n_orders FROM i),
      |pr AS (SELECT a.p AS pa, b.p AS pb, count(*) AS n_ab
      |  FROM i a JOIN i b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 3)
      |SELECT pa, pb, CAST(n_ab AS BIGINT) AS n_ab,
      | CAST(sa.n_p AS BIGINT) AS n_a, CAST(sb.n_p AS BIGINT) AS n_b,
      | CAST((100 * n_ab * n_orders) // (sa.n_p * sb.n_p) AS BIGINT)
      |   AS lift_x100
      |FROM pr JOIN s sa ON sa.p = pa JOIN s sb ON sb.p = pb, n
      |ORDER BY n_ab DESC, lift_x100 DESC, pa, pb LIMIT 100""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    "q76_pagerank" -> q76PageRank,
    "q77_triangles" -> q77Triangles,
    "q88_kcore" -> q88KCore,
    "q99_hits" -> q99Hits,
    "q103_basket_lift" -> q103BasketLift,
  )

  val oracles: ListMap[String, String] = ListMap(
    "q76_pagerank" -> q76Oracle,
    "q77_triangles" -> q77Oracle,
    "q88_kcore" -> q88Oracle,
    "q99_hits" -> q99Oracle,
    "q103_basket_lift" -> q103Oracle,
  )
}
