package graft.core

import org.apache.spark.sql.types._

/** OME PixelType ↔ Spark DataType bridge — the analog of the reference's
  * numpy-dtype maps (/root/reference/bioio/ome_utils.py:85-96 forward,
  * 122-137 inverse; unknown types raise ValueError in both directions).
  *
  * Unsigned integers have no direct Spark type: they widen on read
  * (uint8→Short, uint16→Int, uint32→Long) and the original PixelType is
  * retained in the scene catalog so writers can narrow back.
  * Complex types map to a (re, im) struct.
  */
object PixelType extends Enumeration {
  val Int8, Int16, Int32, UInt8, UInt16, UInt32, Float32, Float64,
      Complex64, Complex128 = Value

  private def complexStruct(t: DataType): StructType =
    StructType(Seq(StructField("re", t), StructField("im", t)))

  /** PixelType → the Spark type planes of that dtype decode to. */
  val toSpark: Map[Value, DataType] = Map(
    Int8 -> ByteType,
    Int16 -> ShortType,
    Int32 -> IntegerType,
    UInt8 -> ShortType,   // widened
    UInt16 -> IntegerType, // widened
    UInt32 -> LongType,    // widened
    Float32 -> FloatType,
    Float64 -> DoubleType,
    Complex64 -> complexStruct(FloatType),
    Complex128 -> complexStruct(DoubleType),
  )

  /** Spark type → PixelType for the writer path (widened unsigned forms
    * are not invertible; signed mapping wins, as in the reference where
    * the dtype→OME map is exact or raises). */
  def fromSpark(dt: DataType): Value = dt match {
    case ByteType    => Int8
    case ShortType   => Int16
    case IntegerType => Int32
    case FloatType   => Float32
    case DoubleType  => Float64
    case s: StructType if s == complexStruct(FloatType)  => Complex64
    case s: StructType if s == complexStruct(DoubleType) => Complex128
    case other =>
      throw new IllegalArgumentException(
        s"Unsupported Spark type for pixel data: $other")
  }

  def parse(name: String): Value =
    values.find(_.toString.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(s"Unknown pixel type: $name"))
}
