package graft.core

/** Canonical dimension model (reference: bioio_base.dimensions, observed via
  * /root/reference/bioio/bio_image.py:504-517 and the guess table pinned by
  * /root/reference/bioio/tests/test_array_like_reader.py:26-114,718-728).
  *
  * Canonical orders:
  *   TCZYX        — default 5D (Time, Channel, Z, Y, X)
  *   TCZYXS       — +Samples (RGB)
  *   MTCZYX       — +leading mosaic-tile index
  *   MTCZYXS      — both
  */
object Dims {
  val Default = "TCZYX"
  val WithSamples = "TCZYXS"
  val WithMosaic = "MTCZYX"
  val WithMosaicAndSamples = "MTCZYXS"

  /** Dimension letters that survive normalization; anything else is reduced
    * at index 0 (reference tests/test_array_like_reader.py:1050-1059). */
  val Known: Set[Char] = "MTCZYXS".toSet

  /** Guess a dimension order from rank: the trailing suffix of TCZYX /
    * TCZYXS (reference array_like_reader.py:131-163 — only >6 dims raise).
    *   1D→X, 2D→YX, 3D→ZYX, 4D→CZYX, 5D→TCZYX, 6D→TCZYXS; 0D/7D+ → error.
    */
  def guess(rank: Int): String = rank match {
    case 1 => "X"
    case 2 => "YX"
    case 3 => "ZYX"
    case 4 => "CZYX"
    case 5 => "TCZYX"
    case 6 => "TCZYXS"
    case n =>
      throw new InvalidDimensionOrdering(
        s"Cannot guess dimension order for rank-$n data; provide dimOrder " +
          "explicitly (guessable ranks are 1..6)")
  }

  /** Validate an explicit dim order against an array rank
    * (reference array_like_reader.py:271-300). */
  def validate(order: String, rank: Int): String = {
    if (order.length != rank)
      throw new ConflictingArguments(
        s"dimOrder '$order' (${order.length} dims) does not match data rank $rank")
    if (order.distinct.length != order.length)
      throw new ConflictingArguments(s"dimOrder '$order' has repeated dimensions")
    order
  }

  /** Target canonical order for normalization: includes S iff the source
    * has samples, M iff the source has mosaic tiles
    * (reference bio_image.py:504-517). */
  def canonicalFor(sourceOrder: String): String = {
    val hasS = sourceOrder.contains('S')
    val hasM = sourceOrder.contains('M')
    (hasM, hasS) match {
      case (true, true)   => WithMosaicAndSamples
      case (true, false)  => WithMosaic
      case (false, true)  => WithSamples
      case (false, false) => Default
    }
  }
}

/** Paired (name, size) dims with attribute-style access
  * (reference bio_image.py:749-762). */
final case class Dimensions(order: String, sizes: Seq[Long]) {
  require(order.length == sizes.length,
    s"order '$order' and sizes $sizes rank mismatch")
  def apply(d: Char): Long = {
    val i = order.indexOf(d)
    if (i < 0) throw new NoSuchElementException(s"dimension $d not in '$order'")
    sizes(i)
  }
  def T: Long = apply('T')
  def C: Long = apply('C')
  def Z: Long = apply('Z')
  def Y: Long = apply('Y')
  def X: Long = apply('X')
  def M: Long = apply('M')
  def S: Long = apply('S')
  def shape: Seq[Long] = sizes
  override def toString: String =
    order.zip(sizes).map { case (d, s) => s"$d: $s" }
      .mkString("<Dimensions [", ", ", "]>")
}

/** Error taxonomy mirroring the reference's
  * (bioio_base.exceptions, observed from test xfail rows). */
class ConflictingArguments(msg: String) extends IllegalArgumentException(msg)
class InvalidDimensionOrdering(msg: String) extends IllegalArgumentException(msg)
class UnsupportedFileFormatError(msg: String) extends IllegalArgumentException(msg)
