package graft.core

/** Minimal driver-side dense nd-array (row-major), the analog of the
  * reference's in-memory numpy inputs/outputs. Used only at the API
  * boundary: as ArrayLikeReader input and as the eager `NDStack` result of
  * getImageData — never as a distributed representation (that's the plane
  * DataFrame).
  */
final case class NDArray(shape: Seq[Int], data: Array[Double]) {
  require(shape.forall(_ > 0), s"non-positive dim in $shape")
  require(shape.product == data.length,
    s"shape $shape implies ${shape.product} elements, got ${data.length}")

  def rank: Int = shape.length

  private val strides: Array[Int] = {
    val s = new Array[Int](rank)
    var acc = 1
    for (i <- rank - 1 to 0 by -1) { s(i) = acc; acc *= shape(i) }
    s
  }

  def apply(idx: Int*): Double = {
    require(idx.length == rank, s"need $rank indices, got ${idx.length}")
    data(idx.zip(strides).map { case (i, s) => i * s }.sum)
  }

  /** Iterate (indices, value) in row-major order. */
  def iterator: Iterator[(Array[Int], Double)] =
    data.iterator.zipWithIndex.map { case (v, flat) =>
      val idx = new Array[Int](rank)
      var rem = flat
      var i = 0
      while (i < rank) { idx(i) = rem / strides(i); rem %= strides(i); i += 1 }
      (idx, v)
    }
}

object NDArray {
  /** Build from a shape and an index->value function (test fixtures). */
  def tabulate(shape: Seq[Int])(f: Seq[Int] => Double): NDArray = {
    val total = shape.product
    val data = new Array[Double](total)
    val idx = new Array[Int](shape.length)
    var flat = 0
    while (flat < total) {
      data(flat) = f(idx.toSeq)
      var d = shape.length - 1
      while (d >= 0) {
        idx(d) += 1
        if (idx(d) < shape(d)) d = -1 else { idx(d) = 0; d -= 1 }
      }
      flat += 1
    }
    NDArray(shape, data)
  }

  def zeros(shape: Seq[Int]): NDArray =
    NDArray(shape, new Array[Double](shape.product))
}
