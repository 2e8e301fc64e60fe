package graft.plugins

import graft.core.PlaneRow

/** Inclusive constraint set for one integer plane coordinate, derived
  * from pushed-down DataSource V2 filters. `eqs` is the intersection of
  * every EqualTo/In seen for the column; `lo`/`hi` fold
  * GreaterThan(OrEqual)/LessThan(OrEqual). All three compose by
  * narrowing, so conjunctions of pushed filters stay exact. */
final case class DimBound(
    eqs: Option[Set[Long]] = None,
    lo: Long = Long.MinValue,
    hi: Long = Long.MaxValue) extends Serializable {
  def accepts(v: Long): Boolean =
    eqs.forall(_.contains(v)) && v >= lo && v <= hi
  def narrowEq(vs: Set[Long]): DimBound =
    copy(eqs = Some(eqs.map(_.intersect(vs)).getOrElse(vs)))
  def narrowLo(v: Long): DimBound = copy(lo = math.max(lo, v))
  def narrowHi(v: Long): DimBound = copy(hi = math.min(hi, v))
  def constrained: Boolean =
    eqs.nonEmpty || lo != Long.MinValue || hi != Long.MaxValue
}

/** Serializable conjunction of per-coordinate bounds — the V2 scan's
  * catalog-prune contract. The driver prunes scenes/levels and readers
  * prune their work descriptors (TIFF segments, zarr chunk keys) with
  * it BEFORE any byte of pixel data is read; the partition reader
  * re-applies it row-level so pushed filters are fully consumed
  * (residual coordinates a reader cannot prune at descriptor level —
  * e.g. the sample band inside an interleaved chunk — still never
  * leave the scan). */
final case class PlanePredicate(
    sceneIdx: DimBound = DimBound(),
    sceneIds: Option[Set[String]] = None,
    level: DimBound = DimBound(),
    m: DimBound = DimBound(),
    t: DimBound = DimBound(),
    c: DimBound = DimBound(),
    z: DimBound = DimBound(),
    s: DimBound = DimBound()) extends Serializable {
  def acceptsScene(idx: Int, id: String): Boolean =
    sceneIdx.accepts(idx) && sceneIds.forall(_.contains(id))
  def acceptsLevel(l: Int): Boolean = level.accepts(l)
  /** Descriptor-level prune on the coordinates every format indexes by. */
  def acceptsCoords(mi: Int, ti: Int, ci: Int, zi: Int): Boolean =
    m.accepts(mi) && t.accepts(ti) && c.accepts(ci) && z.accepts(zi)
  def acceptsPlane(r: PlaneRow): Boolean =
    acceptsScene(r.scene_idx, r.scene_id) && level.accepts(r.level) &&
      acceptsCoords(r.m, r.t, r.c, r.z) && s.accepts(r.s)
}

object PlanePredicate {
  val All: PlanePredicate = PlanePredicate()
}

/** One unit of DataSource V2 scan work for a (scene, level) — what a
  * reader hands the connector from [[BioReader.v2ScanWork]].
  * `objects` counts the stored objects (files / zarr chunk or shard
  * objects / TIFF segments) the unit reads — the pruned-IO number the
  * scan reports and specs pin. */
sealed trait ScanWork extends Serializable {
  def objects: Int
}

/** Rows decoded at PLANNING time on the driver — the right shape for
  * the single-small-object formats (PNG/BMP/GIF, npy/npz members, MRC,
  * tar samples, AVI, in-memory arrays) whose existing readers already
  * decode at the driver: the V2 path adds no new driver materialization
  * over their `readDelayed`. Distributed formats return [[DeferredRows]]
  * instead. */
final case class InlineRows(rows: Seq[PlaneRow], objects: Int = 1)
    extends ScanWork

/** Executor-side decode: the serializable thunk runs inside the V2
  * partition reader, so pixel bytes never visit the driver. */
final case class DeferredRows(objects: Int,
    thunk: () => Iterator[PlaneRow]) extends ScanWork
