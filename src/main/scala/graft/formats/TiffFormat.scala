package graft.formats

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import graft.core.PixelType

/** Baseline TIFF 6.0 container primitives: header + IFD chain parsing and
  * emission, uncompressed strips, both byte orders on read, little-endian
  * on write. This is the substrate of the OME-TIFF reader/writer plugins
  * (the reference's plugin registry lists OME-TIFF among its core formats,
  * /root/reference/README.md:55-70; the format itself is the public TIFF
  * 6.0 + OME-XML-in-ImageDescription convention).
  *
  * Scope: classic TIFF (4 GiB offsets). The engine's scale path for huge
  * images is the Parquet plane store; OME-TIFF is the interchange sink.
  */
object TiffFormat {
  // TIFF tag ids
  val TagImageWidth = 256
  val TagImageLength = 257
  val TagBitsPerSample = 258
  val TagCompression = 259
  val TagPhotometric = 262
  val TagImageDescription = 270
  val TagStripOffsets = 273
  val TagSamplesPerPixel = 277
  val TagRowsPerStrip = 278
  val TagStripByteCounts = 279
  val TagSampleFormat = 339

  // field types
  val TypeAscii = 2
  val TypeShort = 3
  val TypeLong = 4

  def bytesPerSample(pt: PixelType.Value): Int = pt match {
    case PixelType.Int8 | PixelType.UInt8   => 1
    case PixelType.Int16 | PixelType.UInt16 => 2
    case PixelType.Int32 | PixelType.UInt32 | PixelType.Float32 => 4
    case PixelType.Float64 => 8
    case other =>
      throw new IllegalArgumentException(s"TIFF cannot store $other planes")
  }

  /** TIFF SampleFormat: 1 = unsigned int, 2 = signed int, 3 = IEEE float. */
  def sampleFormat(pt: PixelType.Value): Int = pt match {
    case PixelType.UInt8 | PixelType.UInt16 | PixelType.UInt32 => 1
    case PixelType.Int8 | PixelType.Int16 | PixelType.Int32    => 2
    case PixelType.Float32 | PixelType.Float64                 => 3
    case other =>
      throw new IllegalArgumentException(s"TIFF cannot store $other planes")
  }

  def pixelTypeOf(sampleFormat: Int, bits: Int): PixelType.Value =
    (sampleFormat, bits) match {
      case (1, 8)  => PixelType.UInt8
      case (1, 16) => PixelType.UInt16
      case (1, 32) => PixelType.UInt32
      case (2, 8)  => PixelType.Int8
      case (2, 16) => PixelType.Int16
      case (2, 32) => PixelType.Int32
      case (3, 32) => PixelType.Float32
      case (3, 64) => PixelType.Float64
      case other =>
        throw new IllegalArgumentException(
          s"Unsupported TIFF sample format/bits: $other")
    }

  // ------------------------------------------------------------- writing

  /** One IFD entry; numeric value must fit inline (≤ 4 bytes) unless it is
    * a pointer to out-of-line data the caller laid out. */
  final case class Entry(tag: Int, typ: Int, count: Long, value: Long)

  def headerBytes(firstIfdOffset: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put('I'.toByte).put('I'.toByte).putShort(42)
    b.putInt(firstIfdOffset.toInt)
    b.array()
  }

  def ifdSize(nEntries: Int): Int = 2 + nEntries * 12 + 4

  def ifdBytes(entries: Seq[Entry], nextIfdOffset: Long): Array[Byte] = {
    val sorted = entries.sortBy(_.tag) // TIFF requires ascending tag order
    val b = ByteBuffer.allocate(ifdSize(sorted.length))
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(sorted.length.toShort)
    sorted.foreach { e =>
      b.putShort(e.tag.toShort)
      b.putShort(e.typ.toShort)
      b.putInt(e.count.toInt)
      e.typ match {
        case TypeShort if e.count == 1 =>
          b.putShort(e.value.toShort).putShort(0)
        case _ => b.putInt(e.value.toInt)
      }
    }
    b.putInt(nextIfdOffset.toInt)
    b.array()
  }

  /** Standard entry set for one grayscale uncompressed plane written as a
    * single strip; `description` = (offset, length incl. NUL) of the
    * out-of-line ASCII OME-XML (first IFD only). */
  def planeEntries(w: Int, h: Int, pt: PixelType.Value, stripOffset: Long,
      description: Option[(Long, Long)]): Seq[Entry] = {
    val base = Seq(
      Entry(TagImageWidth, TypeLong, 1, w),
      Entry(TagImageLength, TypeLong, 1, h),
      Entry(TagBitsPerSample, TypeShort, 1, bytesPerSample(pt) * 8L),
      Entry(TagCompression, TypeShort, 1, 1), // none
      Entry(TagPhotometric, TypeShort, 1, 1), // BlackIsZero
      Entry(TagStripOffsets, TypeLong, 1, stripOffset),
      Entry(TagSamplesPerPixel, TypeShort, 1, 1),
      Entry(TagRowsPerStrip, TypeLong, 1, h),
      Entry(TagStripByteCounts, TypeLong, 1, w.toLong * h * bytesPerSample(pt)),
      Entry(TagSampleFormat, TypeShort, 1, sampleFormat(pt)))
    base ++ description.map { case (off, len) =>
      Entry(TagImageDescription, TypeAscii, len, off)
    }
  }

  /** Encode one plane of doubles into strip bytes of the given type
    * (little-endian), narrowing as the reference's writer does from its
    * in-memory arrays. */
  def encodePlane(px: Array[Double], pt: PixelType.Value): Array[Byte] = {
    val b = ByteBuffer.allocate(px.length * bytesPerSample(pt))
      .order(ByteOrder.LITTLE_ENDIAN)
    pt match {
      case PixelType.Int8 | PixelType.UInt8 =>
        px.foreach(v => b.put(v.toInt.toByte))
      case PixelType.Int16 | PixelType.UInt16 =>
        px.foreach(v => b.putShort(v.toInt.toShort))
      case PixelType.Int32 | PixelType.UInt32 =>
        px.foreach(v => b.putInt(v.toLong.toInt))
      case PixelType.Float32 => px.foreach(v => b.putFloat(v.toFloat))
      case PixelType.Float64 => px.foreach(b.putDouble)
      case other =>
        throw new IllegalArgumentException(s"TIFF cannot store $other planes")
    }
    b.array()
  }

  // ------------------------------------------------------------- reading

  /** Parsed per-IFD facts needed to locate and decode one plane. */
  final case class ParsedIfd(
      width: Int,
      height: Int,
      bits: Int,
      sampleFormat: Int,
      compression: Int,
      stripOffsets: Seq[Long],
      stripByteCounts: Seq[Long],
      description: Option[String])

  def isTiff(magic: Array[Byte]): Boolean =
    magic.length >= 4 &&
      ((magic(0) == 'I' && magic(1) == 'I' && magic(2) == 42 && magic(3) == 0) ||
        (magic(0) == 'M' && magic(1) == 'M' && magic(2) == 0 && magic(3) == 42))

  /** Walk the IFD chain via a random-access `read(offset, len)` callback
    * (driver-side; a handful of small reads regardless of file size). */
  def parseIfds(read: (Long, Int) => Array[Byte]): (ByteOrder, Seq[ParsedIfd]) = {
    val head = read(0, 8)
    require(isTiff(head), "not a TIFF file")
    val order =
      if (head(0) == 'I') ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    def buf(off: Long, len: Int): ByteBuffer =
      ByteBuffer.wrap(read(off, len)).order(order)
    def u32(b: ByteBuffer): Long = b.getInt.toLong & 0xffffffffL
    def u16(b: ByteBuffer): Int = b.getShort & 0xffff

    var next = u32(buf(4, 4))
    val out = Seq.newBuilder[ParsedIfd]
    while (next != 0) {
      val n = u16(buf(next, 2))
      val body = buf(next + 2, n * 12 + 4)
      val entries = (0 until n).map { _ =>
        val tag = u16(body)
        val typ = u16(body)
        val count = u32(body)
        val raw = new Array[Byte](4)
        body.get(raw)
        (tag, typ, count, raw)
      }
      next = u32(body) // the 4 bytes following the entry table

      def values(tag: Int): Seq[Long] =
        entries.find(_._1 == tag).map { case (_, typ, count, raw) =>
          val sz = if (typ == TypeShort) 2 else 4
          val total = sz * count.toInt
          val data =
            if (total <= 4) raw
            else read(u32(ByteBuffer.wrap(raw).order(order)), total)
          val b = ByteBuffer.wrap(data).order(order)
          (0 until count.toInt).map { _ =>
            if (sz == 2) (b.getShort & 0xffff).toLong
            else b.getInt.toLong & 0xffffffffL
          }
        }.getOrElse(Seq.empty)
      def value(tag: Int, default: Long = -1): Long =
        values(tag).headOption.getOrElse(default)

      val desc = entries.find(_._1 == TagImageDescription).map {
        case (_, _, count, raw) =>
          val off =
            if (count <= 4) -1L else u32(ByteBuffer.wrap(raw).order(order))
          val bytes =
            if (off < 0) raw.take(count.toInt) else read(off, count.toInt)
          // ASCII fields are NUL-terminated
          new String(bytes, StandardCharsets.UTF_8).takeWhile(_ != '\u0000')
      }

      out += ParsedIfd(
        width = value(TagImageWidth).toInt,
        height = value(TagImageLength).toInt,
        bits = value(TagBitsPerSample, 8).toInt,
        sampleFormat = value(TagSampleFormat, 1).toInt,
        compression = value(TagCompression, 1).toInt,
        stripOffsets = values(TagStripOffsets),
        stripByteCounts = values(TagStripByteCounts),
        description = desc)
    }
    (order, out.result())
  }

  /** Decode concatenated strip bytes into a double array. */
  def decodePlane(bytes: Array[Byte], bits: Int, sampleFormat: Int,
      order: ByteOrder): Array[Double] = {
    val b = ByteBuffer.wrap(bytes).order(order)
    val n = bytes.length / (bits / 8)
    val out = new Array[Double](n)
    val pt = pixelTypeOf(sampleFormat, bits)
    var i = 0
    while (i < n) {
      out(i) = pt match {
        case PixelType.UInt8   => (b.get & 0xff).toDouble
        case PixelType.Int8    => b.get.toDouble
        case PixelType.UInt16  => (b.getShort & 0xffff).toDouble
        case PixelType.Int16   => b.getShort.toDouble
        case PixelType.UInt32  => (b.getInt.toLong & 0xffffffffL).toDouble
        case PixelType.Int32   => b.getInt.toDouble
        case PixelType.Float32 => b.getFloat.toDouble
        case PixelType.Float64 => b.getDouble
        case other => throw new IllegalStateException(other.toString)
      }
      i += 1
    }
    out
  }
}
