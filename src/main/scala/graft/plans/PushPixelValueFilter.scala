package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst rule: rewrite pixel-VALUE predicates against the plane
  * store's per-plane statistics (SURVEY §4's custom-rule slot).
  *
  * The plane table's long-form pixel view is
  * `Generate(posexplode(pixels))`; a predicate on the exploded value `v`
  * cannot be pushed below the Generate by the built-in rules because it
  * references generator output. But when the Generate's child carries the
  * store's `px_min`/`px_max` columns (one min/max per plane,
  * ParquetPlaneStore), a value bound implies a PLANE-level bound: a plane
  * with px_max < lo contains no pixel ≥ lo. This rule inserts that
  * implied filter BELOW the Generate, where the ordinary pushdown rules
  * carry it into the parquet scan (`PushedFilters`) and row-group
  * statistics skip whole planes without reading their pixel arrays.
  *
  * Registered as a POST-HOC RESOLUTION rule (GraftExtensions): it must
  * run before ColumnPruning, which would otherwise strip the (so far
  * unreferenced) stats columns in the same optimizer batch and erase the
  * opportunity. At analysis time the filter sits above the projection
  * chain of the pixel view, so the rule walks Projects that pass `v`
  * through untouched. Sound because the inserted bound is implied
  * (conservative): it only removes plane rows none of whose elements can
  * satisfy the original predicate, which still applies above the
  * Generate. The px-stats guard keeps it idempotent across fixed-point
  * analysis runs.
  */
object PushPixelValueFilter extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      rewrite(cond, child).map(c => f.copy(child = c)).getOrElse(f)
  }

  /** Walk Projects (which may add/drop columns but pass `v` through by
    * exprId) down to a Generate whose child has the stats columns. */
  private def rewrite(cond: Expression,
      plan: LogicalPlan): Option[LogicalPlan] = plan match {
    case p: Project =>
      rewrite(cond, p.child).map(c => p.copy(child = c))
    case g: Generate
        if g.child.output.exists(_.name == "px_min") &&
          g.child.output.exists(_.name == "px_max") &&
          !alreadyGuarded(g.child) =>
      (explodedPixels(g.generator) match {
        case Some(pixels) =>
          val pxMin = g.child.output.find(_.name == "px_min").get
          val pxMax = g.child.output.find(_.name == "px_max").get
          // all three columns must flow UNMODIFIED from the same leaf —
          // a derived/renamed pixels array (or one joined in from another
          // relation) is not described by these stats
          if (!sameLeafUnmodified(g.child, Seq(pixels, pxMin, pxMax)))
            None
          else {
            val vAttr = g.generatorOutput.last // (pos,) value
            val bounds = splitConjunctivePredicates(cond)
              .flatMap(boundFor(_, vAttr, pxMin, pxMax))
            if (bounds.isEmpty) None
            else Some(g.copy(child = Filter(bounds.reduce(And), g.child)))
          }
        case None => None
      })
    case _ => None
  }

  /** The plane-store schema convention: the exploded array must be the
    * `pixels` column itself. */
  private def explodedPixels(gen: Expression): Option[Attribute] =
    gen match {
      case e: ExplodeBase => e.child match {
        case a: Attribute if a.name == "pixels" => Some(a)
        case _                                  => None
      }
      case _ => None
    }

  /** True iff every attribute traces through pass-through Projects and
    * Filters to the SAME leaf relation, unmodified (no computed aliases,
    * no joins/unions in between). */
  private def sameLeafUnmodified(plan: LogicalPlan,
      attrs: Seq[Attribute]): Boolean = {
    def producer(p: LogicalPlan, a: Attribute): Option[LogicalPlan] = p match {
      case l: LeafNode =>
        if (l.output.exists(_.exprId == a.exprId)) Some(l) else None
      case proj: Project =>
        proj.projectList.find(_.exprId == a.exprId).flatMap {
          case att: Attribute         => producer(proj.child, att)
          // a RENAME is not a pass-through: stats resolved by the
          // post-projection names must describe a leaf attribute of the
          // same name, else `pixels` could alias an unrelated array
          case Alias(att: Attribute, _) if att.name == a.name =>
            producer(proj.child, att)
          case _                      => None // computed/renamed — don't trust
        }
      case f: Filter    => producer(f.child, a)
      case s: SubqueryAlias => producer(s.child, a)
      case _ => None // joins, unions, aggregates: don't risk it
    }
    val leaves = attrs.map(producer(plan, _))
    leaves.forall(_.isDefined) &&
      leaves.flatten.distinct.lengthCompare(1) == 0
  }

  private def alreadyGuarded(p: LogicalPlan): Boolean = p match {
    case Filter(c, _) =>
      c.references.exists(a => a.name == "px_min" || a.name == "px_max")
    case _ => false
  }

  /** The plane-level bound implied by one conjunct on the pixel value.
    * Every bound is null-safe: rows from pre-stats parquet files in a
    * mixed-schema store read the stats as NULL and must not be dropped. */
  private def boundFor(e: Expression, v: Attribute, pxMin: Attribute,
      pxMax: Attribute): Option[Expression] = {
    def ns(stat: Attribute, bound: Expression): Option[Expression] =
      Some(Or(IsNull(stat), bound))
    e match {
      case GreaterThanOrEqual(a: Attribute, l) if a.semanticEquals(v) && l.foldable =>
        ns(pxMax, GreaterThanOrEqual(pxMax, l))
      case GreaterThan(a: Attribute, l) if a.semanticEquals(v) && l.foldable =>
        ns(pxMax, GreaterThan(pxMax, l))
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(v) && l.foldable =>
        ns(pxMin, LessThanOrEqual(pxMin, l))
      case LessThan(a: Attribute, l) if a.semanticEquals(v) && l.foldable =>
        ns(pxMin, LessThan(pxMin, l))
      case EqualTo(a: Attribute, l) if a.semanticEquals(v) && l.foldable =>
        Some(And(Or(IsNull(pxMin), LessThanOrEqual(pxMin, l)),
          Or(IsNull(pxMax), GreaterThanOrEqual(pxMax, l))))
      // reversed operand order
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(v) && l.foldable =>
        ns(pxMin, LessThanOrEqual(pxMin, l))
      case GreaterThan(l, a: Attribute) if a.semanticEquals(v) && l.foldable =>
        ns(pxMin, LessThan(pxMin, l))
      case LessThanOrEqual(l, a: Attribute) if a.semanticEquals(v) && l.foldable =>
        ns(pxMax, GreaterThanOrEqual(pxMax, l))
      case LessThan(l, a: Attribute) if a.semanticEquals(v) && l.foldable =>
        ns(pxMax, GreaterThan(pxMax, l))
      case EqualTo(l, a: Attribute) if a.semanticEquals(v) && l.foldable =>
        Some(And(Or(IsNull(pxMin), LessThanOrEqual(pxMin, l)),
          Or(IsNull(pxMax), GreaterThanOrEqual(pxMax, l))))
      case _ => None
    }
  }
}
