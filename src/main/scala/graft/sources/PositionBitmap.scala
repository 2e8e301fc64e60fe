package graft.sources

/** Roaring-style compressed bitmap over non-negative Long row
  * positions — the in-memory/closure representation of a positional
  * deletion vector (the public RoaringBitmap layout idea: split the
  * key space into 2^16-wide chunks, store each chunk as a sorted
  * short array while sparse and flip to a 1024-word bitset once it
  * holds > 4096 entries, so memory is ~2 bytes/position when sparse
  * and ≤ 8 KiB per 64 Ki rows when dense — never 8 bytes/position
  * like a raw `Array[Long]` mask). Gives O(1) membership for the DV
  * reader's per-row probe and a sorted iterator for spec-level
  * ground-truth checks.
  *
  * Deliberately minimal (add/contains/iterator/cardinality): built
  * once at plan time from a delete file's positions, shipped in the
  * task closure, probed per row. Not thread-safe during build; reads
  * after build are safe from any thread.
  */
final class PositionBitmap extends Serializable {
  import PositionBitmap._

  // chunk index (pos >>> 16) → container over the low 16 bits; a
  // TreeMap keeps chunk iteration in position order
  private val containers = new java.util.TreeMap[Long, Container]

  def add(pos: Long): Unit = {
    require(pos >= 0, s"negative row position $pos")
    val hi = pos >>> 16
    val c = containers.get(hi)
    if (c == null) {
      val fresh = new ArrayContainer
      fresh.add(pos.toInt & 0xFFFF)
      containers.put(hi, fresh)
    } else {
      val replaced = c.add(pos.toInt & 0xFFFF)
      if (replaced ne c) containers.put(hi, replaced)
    }
  }

  def contains(pos: Long): Boolean = {
    if (pos < 0) return false
    val c = containers.get(pos >>> 16)
    c != null && c.contains(pos.toInt & 0xFFFF)
  }

  def isEmpty: Boolean = containers.isEmpty

  def cardinality: Long = {
    var n = 0L
    val it = containers.values().iterator()
    while (it.hasNext) n += it.next().cardinality
    n
  }

  /** Positions in ascending order. */
  def iterator: Iterator[Long] = {
    import scala.jdk.CollectionConverters._
    containers.entrySet().iterator().asScala.flatMap { e =>
      val base = e.getKey << 16
      e.getValue.iterator.map(low => base | low.toLong)
    }
  }

  /** Approximate in-memory footprint — the closure-size gate the
    * scale specs pin (a dense mask must compress, not ship 8 B/row). */
  def sizeBytes: Long = {
    var n = 64L // map shell
    val it = containers.values().iterator()
    while (it.hasNext) n += 48L + it.next().sizeBytes
    n
  }
}

object PositionBitmap {

  /** Array container flips to a bitset beyond this cardinality —
    * 4096 × 2 B = 8 KiB, the bitset's fixed size (RoaringBitmap's
    * crossover). */
  val ArrayToBitmapThreshold = 4096

  /** Build from positions in any order (duplicates collapse). */
  def of(positions: Iterator[Long]): PositionBitmap = {
    val b = new PositionBitmap
    positions.foreach(b.add)
    b
  }

  def of(positions: Array[Long]): PositionBitmap = of(positions.iterator)

  private[sources] sealed trait Container extends Serializable {
    /** Add a low-16-bit value; returns the container to keep (a
      * replacement when an array container upgrades to a bitset). */
    def add(low: Int): Container
    def contains(low: Int): Boolean
    def cardinality: Int
    /** Ascending low values, 0..65535. */
    def iterator: Iterator[Int]
    def sizeBytes: Long
  }

  /** Sorted unsigned-short array; ≤ 4096 entries. */
  private[sources] final class ArrayContainer extends Container {
    private var values = new Array[Short](8)
    private var n = 0

    private def search(low: Int): Int = {
      // branchless-ish binary search over unsigned shorts
      var lo = 0
      var hi = n - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = values(mid) & 0xFFFF
        if (v < low) lo = mid + 1
        else if (v > low) hi = mid - 1
        else return mid
      }
      -(lo + 1)
    }

    override def add(low: Int): Container = {
      val i = search(low)
      if (i >= 0) return this
      if (n == ArrayToBitmapThreshold) {
        val bm = new BitmapContainer
        var j = 0
        while (j < n) { bm.add(values(j) & 0xFFFF); j += 1 }
        bm.add(low)
        return bm
      }
      if (n == values.length) {
        val grown = new Array[Short](values.length * 2)
        System.arraycopy(values, 0, grown, 0, n)
        values = grown
      }
      val at = -(i + 1)
      System.arraycopy(values, at, values, at + 1, n - at)
      values(at) = low.toShort
      n += 1
      this
    }

    override def contains(low: Int): Boolean = search(low) >= 0
    override def cardinality: Int = n
    override def iterator: Iterator[Int] =
      (0 until n).iterator.map(i => values(i) & 0xFFFF)
    override def sizeBytes: Long = 24L + values.length.toLong * 2
  }

  /** 64 Ki-bit bitset: fixed 8 KiB regardless of density. */
  private[sources] final class BitmapContainer extends Container {
    private val words = new Array[Long](1024)
    private var card = 0

    override def add(low: Int): Container = {
      val w = low >>> 6
      val bit = 1L << (low & 63)
      if ((words(w) & bit) == 0L) {
        words(w) |= bit
        card += 1
      }
      this
    }

    override def contains(low: Int): Boolean =
      (words(low >>> 6) & (1L << (low & 63))) != 0L

    override def cardinality: Int = card
    override def iterator: Iterator[Int] =
      (0 until 65536).iterator.filter(contains)
    override def sizeBytes: Long = 24L + 8192L
  }
}
