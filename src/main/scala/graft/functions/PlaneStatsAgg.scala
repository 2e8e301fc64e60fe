package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-group pixel statistics over plane payloads. */
final case class PlaneStats(min: Double, max: Double, mean: Double, p50: Double)

/** Typed Aggregator (E14) over plane payload arrays: min / max / mean /
  * exact interpolated median of every pixel in the group.
  *
  * The buffer holds the group's values for the exact median — intended
  * for plane-scale groups (a scene's planes, a channel's pixels), guarded
  * by `cap`. For corpus-scale cardinalities use the codegen'd built-ins
  * (`min`/`max`/`avg`/`approx_percentile`) instead; this Aggregator is the
  * typed-API surface for exact small-group stats (SURVEY.md §2.6 UDAF
  * row).
  */
final class PlaneStatsAgg(cap: Int = 1 << 22)
    extends Aggregator[Array[Double], Array[Double], PlaneStats] {

  override def zero: Array[Double] = Array.empty

  override def reduce(b: Array[Double], a: Array[Double]): Array[Double] = {
    val out = new Array[Double](b.length + a.length)
    System.arraycopy(b, 0, out, 0, b.length)
    System.arraycopy(a, 0, out, b.length, a.length)
    if (out.length > cap)
      throw new IllegalStateException(
        s"PlaneStatsAgg buffer exceeded $cap values; use approx_percentile " +
          "for corpus-scale groups")
    out
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    reduce(b1, b2)

  override def finish(b: Array[Double]): PlaneStats = {
    require(b.nonEmpty, "PlaneStatsAgg over an empty group")
    val sorted = b.sorted
    val n = sorted.length
    val p50 =
      if (n % 2 == 1) sorted(n / 2)
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    PlaneStats(sorted.head, sorted.last, b.sum / n, p50)
  }

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoders.arrayDouble

  override def outputEncoder: Encoder[PlaneStats] = Encoders.product[PlaneStats]
}

private object ExpressionEncoders {
  val arrayDouble: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
