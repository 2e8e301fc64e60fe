package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute,
  BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.LongType

/** Native AS-OF JOIN — the whole-operator Catalyst extension tier: a
  * custom logical node, a planner strategy, and a physical merge-join
  * operator, registered through `SparkSessionExtensions`
  * (`GraftExtensions.injectPlannerStrategy`).
  *
  * Semantics: for every left row, attach the LATEST right row with the
  * same key whose time is <= the left row's time (null-extended when no
  * such row exists) — the event-enrichment primitive (pandas
  * `merge_asof`, kdb `aj`, Flink temporal join) that plain SQL can only
  * express as a correlated subquery or a union+window rewrite (q26).
  *
  * Why a custom operator and not composition: the compositional form
  * must union both tables into one event stream and window over it, so
  * the right table's columns ride through the left's shuffle and the
  * window buffers BOTH sides' rows per key. The native form is the plan
  * a purpose-built engine runs: each side shuffles once on its own key,
  * each side sorts (key, time) — both requirements DECLARED to Catalyst
  * via requiredChildDistribution/requiredChildOrdering, so
  * EnsureRequirements plans the exchanges (and AQE still coalesces
  * them) — then one streaming merge pass per co-partition with O(1)
  * state: the single most-recent matching right row. At 100 TB neither
  * side's width taxes the other's shuffle, pre-bucketed (key)-sorted
  * tables satisfy the requirements with NO exchange at all, and the
  * merge never materializes a per-key buffer (the union+window form
  * holds every right row of the key's partition frame).
  *
  * v1 contract: key and time expressions must be LongType (the engine's
  * event keys/timestamps are int64 throughout); the right side is
  * re-aliased internally so self-joins (both sides derived from the
  * same scan) can't collide on expression ids. The merge itself is a
  * non-codegen doExecute — the cost centers (exchange + sort) are
  * Tungsten-planned (an isolated A/B at sf0.1 bounds merge + output
  * at <=15% of q123's wall-clock: full 0.500 s vs 0.423 s for the
  * identical scans+exchanges+sorts materialized without the merge, so
  * CodegenSupport would chase <=75 ms and is deliberately skipped),
  * and the merge is one already-sorted pass whose
  * key/time reads take the BoundReference fast path (direct ordinal
  * getLong off the delivered UnsafeRows — no per-row interpreted eval
  * or boxing; measured q123 at sf0.1 warm: 0.65 s interpreted → 0.57 s
  * fast-path). The pre-bucketed zero-exchange claim is spec-pinned
  * (AsOfJoinSpec "pre-bucketed"): bucketBy(key)+sortBy(key,time)
  * tables with one file per bucket plan ZERO exchanges and — with
  * spark.sql.legacy.bucketedTableScan.outputOrdering on — ZERO sorts. */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected via
  * `GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. Children arrive hash-clustered on their
  * keys and sorted (key, time) — declared, not hand-built — and each
  * co-partition merges in one forward pass holding exactly one buffered
  * right row (the latest candidate). Rows that can no longer match any
  * future left row are discarded as the cursors advance; right rows
  * with a null key or time are unmatchable and skipped. */
final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // the merge emits left rows in their incoming order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** Per-row accessor pair (isNull, getLong) for a bound key/time
    * expression. The common case — the façade only ever passes bare
    * column references — binds to a [[BoundReference]], which reads the
    * long DIRECTLY off the (Unsafe)Row ordinal: no per-row interpreted
    * eval, no Long boxing in the merge loop. Anything else falls back
    * to interpreted eval (the null probe and the value read each eval —
    * acceptable on the rare computed-expression path). */
  private def longAccess(
      e: Expression): (InternalRow => Boolean, InternalRow => Long) =
    e match {
      case b: BoundReference =>
        (r => r.isNullAt(b.ordinal), r => r.getLong(b.ordinal))
      case other =>
        (r => other.eval(r) == null,
          r => other.eval(r).asInstanceOf[Long])
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val (lkNull, lkGet) =
      longAccess(BindReferences.bindReference(leftKey, left.output))
    val (ltNull, ltGet) =
      longAccess(BindReferences.bindReference(leftTime, left.output))
    val (rkNull, rkGet) =
      longAccess(BindReferences.bindReference(rightKey, right.output))
    val (rtNull, rtGet) =
      longAccess(BindReferences.bindReference(rightTime, right.output))
    val rightWidth = right.output.length
    val types = output.map(_.dataType).toArray
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(types)
      var nextRight: InternalRow = if (ri.hasNext) ri.next() else null
      var heldRow: InternalRow = null
      var heldKey: Long = 0L
      var heldTime: Long = 0L
      val tol = tolerance.getOrElse(Long.MaxValue)
      li.map { l =>
        if (lkNull(l) || ltNull(l)) proj(joined(l, nullRight))
        else {
          val k = lkGet(l)
          val t = ltGet(l)
          var scanning = true
          while (scanning && nextRight != null) {
            if (rkNull(nextRight) || rtNull(nextRight)) {
              // unmatchable row: drop and advance
              nextRight = if (ri.hasNext) ri.next() else null
            } else {
              val nkL = rkGet(nextRight)
              val ntL = rtGet(nextRight)
              if (nkL < k || (nkL == k && ntL <= t)) {
                // consumed: the latest so far for its key (iterator rows
                // are reused buffers — copy before advancing past them)
                heldRow = nextRight.copy()
                heldKey = nkL
                heldTime = ntL
                nextRight = if (ri.hasNext) ri.next() else null
              } else scanning = false
            }
          }
          // tolerance: a held row older than (t − tolerance) is a key
          // match but a staleness miss — null-extend, don't match
          if (heldRow != null && heldKey == k && t - heldTime <= tol)
            proj(joined(l, heldRow))
          else proj(joined(l, nullRight))
        }
      }
    }
  }
}

/** Column-name façade: `AsOfJoin(purchases, signups, "user_id", "ts_us",
  * "s_user", "s_ts")`. Validates the LongType contract, re-aliases the
  * right side (fresh expression ids — self-join safe), and materializes
  * the custom logical node as a DataFrame. */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame =
    apply(left, right, leftKey, leftTime, rightKey, rightTime, None)

  /** With `tolerance`: a right row only matches while it is at most
    * `tolerance` time units older than the left row (pandas
    * merge_asof's staleness bound — a quote older than the freshness
    * window enriches nothing). */
  def apply(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      tolerance: Option[Long]): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    val rp = Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new
          IllegalArgumentException(
        s"as-of join: no column '$name' on the $side side " +
          s"(have: ${plan.output.map(_.name).mkString(", ")})"))
    val (lkA, ltA) = (attr(lp, leftKey, "left"), attr(lp, leftTime, "left"))
    val (rkA, rtA) =
      (attr(rp, rightKey, "right"), attr(rp, rightTime, "right"))
    Seq(lkA, ltA, rkA, rtA).foreach(a => require(a.dataType == LongType,
      s"as-of join v1 requires LongType keys/times; '${a.name}' " +
        s"is ${a.dataType.simpleString}"))
    tolerance.foreach(tv => require(tv >= 0,
      s"as-of join tolerance must be non-negative, got $tv"))
    DatasetBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp, lkA, rkA, ltA, rtA, tolerance))
  }
}
