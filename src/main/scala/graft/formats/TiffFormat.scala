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
  val TagNewSubfileType = 254
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
  val TagPlanarConfig = 284
  val TagPredictor = 317
  val TagTileWidth = 322
  val TagTileLength = 323
  val TagTileOffsets = 324
  val TagTileByteCounts = 325
  val TagSubIFDs = 330
  val TagSampleFormat = 339
  val TagJPEGTables = 347

  // TIFF 6.0 Compression tag values (the subset real OME-TIFFs use)
  val CompressionNone = 1
  val CompressionLZW = 5
  val CompressionJpeg = 7 // "new-style" JPEG (TTN2); read-only here
  val CompressionDeflate = 8 // "Adobe" deflate — what tifffile/bioformats emit
  val CompressionPackBits = 32773
  val CompressionDeflateLegacy = 32946

  def compressionSupported(c: Int): Boolean =
    c == CompressionNone || c == CompressionLZW ||
      c == CompressionDeflate || c == CompressionDeflateLegacy ||
      c == CompressionPackBits

  /** Read-side coverage is a superset of write-side: JPEG (7) decodes via
    * javax.imageio, but the hash-checked write path never emits a lossy
    * codec. */
  def readSupported(c: Int): Boolean =
    compressionSupported(c) || c == CompressionJpeg

  // field types
  val TypeAscii = 2
  val TypeShort = 3
  val TypeLong = 4
  val TypeLong8 = 16 // BigTIFF 64-bit unsigned

  def typeSize(typ: Int): Int = typ match {
    case TypeShort => 2
    case TypeLong8 => 8
    case _         => 4 // LONG, and ASCII counts bytes
  }

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

  // -------------------------------------------------- compression codecs

  /** zlib-deflate a segment (Compression=8; tifffile/bioformats default). */
  def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4 + 64)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput())
        throw new IllegalArgumentException("truncated deflate segment")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** TIFF-variant LZW (Compression=5): MSB-first code packing, ClearCode
    * 256 / EOI 257, 9→12-bit codes with the spec's "early change" (width
    * bumps when the table reaches 2^width−1 entries, one code early). */
  object Lzw {
    private val Clear = 256
    private val Eoi = 257

    def decode(bytes: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(bytes.length * 3 + 64)
      // entry code → (prefix code, suffix byte); 0–255 are literal roots
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      var next = 258
      var width = 9
      var bitPos = 0L
      val nBits = bytes.length * 8L
      def read(): Int = {
        if (bitPos + width > nBits) return Eoi // tolerate missing EOI pad
        var v = 0
        var i = 0
        while (i < width) {
          val b = (bytes((bitPos >> 3).toInt) >> (7 - (bitPos & 7)).toInt) & 1
          v = (v << 1) | b
          bitPos += 1; i += 1
        }
        v
      }
      def firstByte(code: Int): Byte = {
        var c = code
        while (c >= 258) c = prefix(c)
        c.toByte
      }
      def emit(code: Int): Unit = {
        var n = 0; var c = code
        while (c >= 258) { n += 1; c = prefix(c) }
        val res = new Array[Byte](n + 1)
        res(0) = c.toByte
        var i = n; c = code
        while (c >= 258) { res(i) = suffix(c); i -= 1; c = prefix(c) }
        out.write(res, 0, res.length)
      }
      def add(prefixCode: Int, s: Byte): Unit =
        if (next < 4096) {
          prefix(next) = prefixCode
          suffix(next) = s
          next += 1
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
      var prevCode = -1
      var code = read()
      while (code != Eoi) {
        if (code == Clear) { next = 258; width = 9; prevCode = -1 }
        else if (prevCode < 0) {
          if (code >= 256)
            throw new IllegalArgumentException(
              s"corrupt LZW stream: first code $code is not a literal")
          out.write(code)
          prevCode = code
        } else if (code < next && code != 257) {
          emit(code)
          add(prevCode, firstByte(code))
          prevCode = code
        } else if (code == next) {
          // KwKwK case: entry being defined is prev + firstByte(prev)
          add(prevCode, firstByte(prevCode))
          emit(next - 1)
          prevCode = code
        } else
          throw new IllegalArgumentException(
            s"corrupt LZW stream: code $code with table size $next")
        code = read()
      }
      out.toByteArray
    }

    def encode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      var cur = 0; var curBits = 0
      var width = 9
      def put(code: Int): Unit = {
        cur = (cur << width) | code
        curBits += width
        while (curBits >= 8) {
          out.write((cur >> (curBits - 8)) & 0xff)
          curBits -= 8
        }
      }
      // (prefix code, suffix byte) → code
      var table = new java.util.HashMap[Integer, Integer](8192)
      def key(p: Int, s: Byte): Integer = (p << 8) | (s & 0xff)
      var next = 258
      put(Clear)
      var omega = -1
      var i = 0
      while (i < data.length) {
        val k = data(i)
        if (omega < 0) omega = k & 0xff
        else {
          val c = table.get(key(omega, k))
          if (c != null) omega = c
          else {
            put(omega)
            table.put(key(omega, k), next)
            next += 1
            // the decoder's table lags one insert behind and bumps at
            // 2^w−1 entries, which is one EMITTED code later from the
            // encoder's view — so the encoder switches at 2^w
            if (next == (1 << width) && width < 12) width += 1
            omega = k & 0xff
            if (next >= 4094) { // reset before the table can overflow
              put(omega); put(Clear)
              table = new java.util.HashMap[Integer, Integer](8192)
              next = 258; width = 9; omega = -1
            }
          }
        }
        i += 1
      }
      if (omega >= 0) put(omega)
      put(Eoi)
      if (curBits > 0) out.write((cur << (8 - curBits)) & 0xff)
      out.toByteArray
    }
  }

  /** TIFF PackBits (Compression=32773): control byte n in 0..127 copies
    * n+1 literals; n in -127..-1 repeats the next byte 1-n times; -128 is
    * a no-op. */
  object PackBits {
    def decode(bytes: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(bytes.length * 2 + 16)
      var i = 0
      while (i < bytes.length) {
        val n = bytes(i)
        i += 1
        if (n >= 0) {
          out.write(bytes, i, n + 1)
          i += n + 1
        } else if (n != -128 && i < bytes.length) {
          val v = bytes(i)
          i += 1
          var k = 1 - n
          while (k > 0) { out.write(v); k -= 1 }
        }
      }
      out.toByteArray
    }

    def encode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(data.length + 16)
      var i = 0
      while (i < data.length) {
        // find run length at i (capped at 128)
        var run = 1
        while (i + run < data.length && run < 128 &&
          data(i + run) == data(i)) run += 1
        if (run >= 2) {
          out.write(1 - run)
          out.write(data(i))
          i += run
        } else {
          // literal stretch until the next ≥2 run (capped at 128)
          var lit = 1
          while (i + lit < data.length && lit < 128 &&
            !(i + lit + 1 < data.length &&
              data(i + lit) == data(i + lit + 1))) lit += 1
          out.write(lit - 1)
          out.write(data, i, lit)
          i += lit
        }
      }
      out.toByteArray
    }
  }

  /** Decompress one strip/tile segment. */
  def decompress(bytes: Array[Byte], compression: Int): Array[Byte] =
    compression match {
      case CompressionNone     => bytes
      case CompressionLZW      => Lzw.decode(bytes)
      case CompressionPackBits => PackBits.decode(bytes)
      case CompressionDeflate | CompressionDeflateLegacy => inflate(bytes)
      case other => throw new IllegalArgumentException(
        s"unsupported TIFF compression $other (supported: none/1, LZW/5, " +
          "deflate/8/32946, PackBits/32773)")
    }

  /** Compress one strip/tile segment. `rowBytes` > 0 gives the segment's
    * row stride; PackBits restarts its encoder at each row boundary (what
    * libtiff emits — strict per-row decoders reject runs that span rows).
    * The stateless PackBits decoder reads the concatenation identically. */
  def compress(bytes: Array[Byte], compression: Int,
      rowBytes: Int = 0): Array[Byte] =
    compression match {
      case CompressionNone     => bytes
      case CompressionLZW      => Lzw.encode(bytes)
      case CompressionPackBits =>
        if (rowBytes <= 0 || bytes.length <= rowBytes) PackBits.encode(bytes)
        else {
          val out = new java.io.ByteArrayOutputStream(bytes.length + 16)
          var off = 0
          while (off < bytes.length) {
            val n = math.min(rowBytes, bytes.length - off)
            out.write(PackBits.encode(
              java.util.Arrays.copyOfRange(bytes, off, off + n)))
            off += n
          }
          out.toByteArray
        }
      case CompressionDeflate | CompressionDeflateLegacy => deflate(bytes)
      case other => throw new IllegalArgumentException(
        s"unsupported TIFF compression $other")
    }

  /** Undo TIFF Predictor 2 (horizontal differencing) in place: each row's
    * samples are deltas from the previous pixel's same sample. Operates on
    * decompressed sample bytes; multi-byte samples use the file byte
    * order. `rowSamples` = width × samplesPerPixel. */
  def undoPredictor(data: Array[Byte], rowSamples: Int, bits: Int,
      samplesPerPixel: Int, order: ByteOrder): Unit = {
    val bytesPer = bits / 8
    val rowBytes = rowSamples * bytesPer
    val nRows = data.length / rowBytes
    val big = order == ByteOrder.BIG_ENDIAN
    var r = 0
    while (r < nRows) {
      val base = r * rowBytes
      var sIdx = samplesPerPixel // first pixel is stored verbatim
      while (sIdx < rowSamples) {
        val off = base + sIdx * bytesPer
        val prev = off - samplesPerPixel * bytesPer
        bytesPer match {
          case 1 => data(off) = (data(off) + data(prev)).toByte
          case 2 =>
            val a =
              if (big) ((data(off) & 0xff) << 8) | (data(off + 1) & 0xff)
              else ((data(off + 1) & 0xff) << 8) | (data(off) & 0xff)
            val b =
              if (big) ((data(prev) & 0xff) << 8) | (data(prev + 1) & 0xff)
              else ((data(prev + 1) & 0xff) << 8) | (data(prev) & 0xff)
            val v = (a + b) & 0xffff
            if (big) { data(off) = (v >> 8).toByte; data(off + 1) = v.toByte }
            else { data(off + 1) = (v >> 8).toByte; data(off) = v.toByte }
          case 4 =>
            var a = 0; var b = 0
            var i = 0
            while (i < 4) {
              val sh = if (big) (3 - i) * 8 else i * 8
              a |= (data(off + i) & 0xff) << sh
              b |= (data(prev + i) & 0xff) << sh
              i += 1
            }
            val v = a + b
            i = 0
            while (i < 4) {
              val sh = if (big) (3 - i) * 8 else i * 8
              data(off + i) = (v >> sh).toByte
              i += 1
            }
          case n => throw new IllegalArgumentException(
            s"predictor 2 with $n-byte samples is not supported")
        }
        sIdx += samplesPerPixel
      }
      r += 1
    }
  }

  /** Undo TIFF Predictor 3 (floating-point horizontal differencing, TIFF
    * Technical Note 3 / libtiff fpAcc): within each row the encoder split
    * every sample into byte planes — all most-significant bytes first,
    * then the next plane, … (MSB-first regardless of the file byte
    * order) — then byte-differenced the whole row. Decode reverses both:
    * cumulative byte sum across the row, then de-interleave the planes
    * back into per-sample bytes, emitted in `order` so downstream sample
    * decoding is uniform with the other predictors. */
  def undoFloatPredictor(data: Array[Byte], rowSamples: Int, bits: Int,
      order: ByteOrder): Unit = {
    val bytesPer = bits / 8
    val rowBytes = rowSamples * bytesPer
    val nRows = data.length / rowBytes
    val big = order == ByteOrder.BIG_ENDIAN
    val tmp = new Array[Byte](rowBytes)
    var r = 0
    while (r < nRows) {
      val base = r * rowBytes
      var i = 1
      while (i < rowBytes) {
        data(base + i) = (data(base + i) + data(base + i - 1)).toByte
        i += 1
      }
      i = 0
      while (i < rowSamples) {
        var j = 0 // j-th significance plane; j = 0 is the MSB
        while (j < bytesPer) {
          val at = if (big) j else bytesPer - 1 - j
          tmp(i * bytesPer + at) = data(base + j * rowSamples + i)
          j += 1
        }
        i += 1
      }
      System.arraycopy(tmp, 0, data, base, rowBytes)
      r += 1
    }
  }

  // ------------------------------------------------------------- writing

  /** One IFD entry; numeric value must fit inline (≤ 4 bytes) unless it is
    * a pointer to out-of-line data the caller laid out. */
  final case class Entry(tag: Int, typ: Int, count: Long, value: Long)

  /** Classic header (version 42, 4-byte offsets) or BigTIFF (version 43,
    * 8-byte offsets, 16-byte header). */
  def headerBytes(firstIfdOffset: Long, big: Boolean = false): Array[Byte] =
    if (big) {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.put('I'.toByte).put('I'.toByte).putShort(43)
      b.putShort(8).putShort(0) // offset bytesize + constant
      b.putLong(firstIfdOffset)
      b.array()
    } else {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put('I'.toByte).put('I'.toByte).putShort(42)
      b.putInt(firstIfdOffset.toInt)
      b.array()
    }

  def ifdSize(nEntries: Int): Int = ifdSize(nEntries, big = false)
  def ifdSize(nEntries: Int, big: Boolean): Int =
    if (big) 8 + nEntries * 20 + 8 else 2 + nEntries * 12 + 4

  def ifdBytes(entries: Seq[Entry], nextIfdOffset: Long): Array[Byte] =
    ifdBytes(entries, nextIfdOffset, big = false)

  def ifdBytes(entries: Seq[Entry], nextIfdOffset: Long,
      big: Boolean): Array[Byte] = {
    val sorted = entries.sortBy(_.tag) // TIFF requires ascending tag order
    val b = ByteBuffer.allocate(ifdSize(sorted.length, big))
      .order(ByteOrder.LITTLE_ENDIAN)
    if (big) b.putLong(sorted.length.toLong) else b.putShort(sorted.length.toShort)
    sorted.foreach { e =>
      b.putShort(e.tag.toShort)
      b.putShort(e.typ.toShort)
      if (big) {
        b.putLong(e.count)
        e.typ match {
          case TypeShort if e.count == 1 =>
            b.putShort(e.value.toShort).putShort(0).putInt(0)
          case _ => b.putLong(e.value)
        }
      } else {
        b.putInt(e.count.toInt)
        e.typ match {
          case TypeShort if e.count == 1 =>
            b.putShort(e.value.toShort).putShort(0)
          case _ => b.putInt(e.value.toInt)
        }
      }
    }
    if (big) b.putLong(nextIfdOffset) else b.putInt(nextIfdOffset.toInt)
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

  /** Parsed per-IFD facts needed to locate and decode one plane. A plane
    * is strip-organized (stripOffsets non-empty) or tile-organized
    * (tileOffsets non-empty) — never both. `subIfds` are the parsed
    * reduced-resolution pyramid levels chained off tag 330 (SubIFDs);
    * `jpegTables` is the shared JPEG tables stream (tag 347) for
    * Compression=7 segments. */
  final case class ParsedIfd(
      width: Int,
      height: Int,
      bits: Int,
      sampleFormat: Int,
      compression: Int,
      samplesPerPixel: Int,
      planarConfig: Int,
      predictor: Int,
      rowsPerStrip: Long,
      stripOffsets: Seq[Long],
      stripByteCounts: Seq[Long],
      tileWidth: Int,
      tileLength: Int,
      tileOffsets: Seq[Long],
      tileByteCounts: Seq[Long],
      description: Option[String],
      subIfds: Seq[ParsedIfd] = Seq.empty,
      jpegTables: Option[Array[Byte]] = None) {
    def tiled: Boolean = tileOffsets.nonEmpty
  }

  def isTiff(magic: Array[Byte]): Boolean =
    magic.length >= 4 &&
      ((magic(0) == 'I' && magic(1) == 'I' &&
        (magic(2) == 42 || magic(2) == 43) && magic(3) == 0) ||
        (magic(0) == 'M' && magic(1) == 'M' && magic(2) == 0 &&
          (magic(3) == 42 || magic(3) == 43)))

  /** Walk the IFD chain via a random-access `read(offset, len)` callback
    * (driver-side; a handful of small reads regardless of file size).
    * Handles classic TIFF (version 42, 4-byte offsets, 12-byte entries)
    * and BigTIFF (version 43, 8-byte offsets, 20-byte entries, LONG8). */
  def parseIfds(read: (Long, Int) => Array[Byte]): (ByteOrder, Seq[ParsedIfd]) = {
    val head = read(0, 8)
    require(isTiff(head), "not a TIFF file")
    val order =
      if (head(0) == 'I') ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val big = head(2) == 43 || head(3) == 43
    def buf(off: Long, len: Int): ByteBuffer =
      ByteBuffer.wrap(read(off, len)).order(order)
    def u32(b: ByteBuffer): Long = b.getInt.toLong & 0xffffffffL
    def u16(b: ByteBuffer): Int = b.getShort & 0xffff
    // inline-value slot: 4 bytes classic, 8 BigTIFF
    val slot = if (big) 8 else 4
    def slotVal(b: ByteBuffer): Long = if (big) b.getLong else u32(b)
    if (big)
      require(u16(buf(4, 2)) == 8,
        "BigTIFF header: offset bytesize must be 8")

    // malformed/malicious chains: a next-IFD pointer looping back would
    // spin the driver forever, and a bogus entry count would allocate GBs
    val visited = scala.collection.mutable.Set.empty[Long]
    val MaxFieldValues = 1 << 24
    val entrySize = if (big) 20 else 12

    /** Parse one IFD: (parsed facts, raw SubIFD offsets, next-IFD offset). */
    def parseOne(at: Long): (ParsedIfd, Seq[Long], Long) = {
      val n =
        if (big) {
          val c = buf(at, 8).getLong
          if (c > 4096)
            throw new IllegalArgumentException(
              s"corrupt TIFF: IFD declares $c entries")
          c.toInt
        } else u16(buf(at, 2))
      val countSize = if (big) 8 else 2
      val body = buf(at + countSize, n * entrySize + slot)
      val entries = (0 until n).map { _ =>
        val tag = u16(body)
        val typ = u16(body)
        val count = if (big) body.getLong else u32(body)
        if (count > MaxFieldValues)
          throw new IllegalArgumentException(
            s"corrupt TIFF: tag $tag declares $count values")
        val raw = new Array[Byte](slot)
        body.get(raw)
        (tag, typ, count, raw)
      }
      val next = slotVal(body) // the offset slot following the entry table

      def values(tag: Int): Seq[Long] =
        entries.find(_._1 == tag).map { case (_, typ, count, raw) =>
          val sz = typeSize(typ)
          val total = sz * count.toInt
          val data =
            if (total <= slot) raw
            else read(slotVal(ByteBuffer.wrap(raw).order(order)), total)
          val b = ByteBuffer.wrap(data).order(order)
          (0 until count.toInt).map { _ =>
            sz match {
              case 2 => (b.getShort & 0xffff).toLong
              case 8 => b.getLong
              case _ => b.getInt.toLong & 0xffffffffL
            }
          }
        }.getOrElse(Seq.empty)
      def value(tag: Int, default: Long = -1): Long =
        values(tag).headOption.getOrElse(default)

      /** Raw bytes of a byte-sized field (ASCII or UNDEFINED, e.g. the
        * JPEGTables stream). */
      def rawBytes(tag: Int): Option[Array[Byte]] =
        entries.find(_._1 == tag).map { case (_, _, count, raw) =>
          if (count <= slot) raw.take(count.toInt)
          else read(slotVal(ByteBuffer.wrap(raw).order(order)), count.toInt)
        }

      val desc = rawBytes(TagImageDescription).map(bytes =>
        // ASCII fields are NUL-terminated
        new String(bytes, StandardCharsets.UTF_8).takeWhile(_ != '\u0000'))

      val height = value(TagImageLength).toInt
      val parsedIfd = ParsedIfd(
        width = value(TagImageWidth).toInt,
        height = height,
        bits = value(TagBitsPerSample, 8).toInt,
        sampleFormat = value(TagSampleFormat, 1).toInt,
        compression = value(TagCompression, 1).toInt,
        samplesPerPixel = value(TagSamplesPerPixel, 1).toInt,
        planarConfig = value(TagPlanarConfig, 1).toInt,
        predictor = value(TagPredictor, 1).toInt,
        rowsPerStrip = value(TagRowsPerStrip, height.toLong max 1L),
        stripOffsets = values(TagStripOffsets),
        stripByteCounts = values(TagStripByteCounts),
        tileWidth = value(TagTileWidth, 0).toInt,
        tileLength = value(TagTileLength, 0).toInt,
        tileOffsets = values(TagTileOffsets),
        tileByteCounts = values(TagTileByteCounts),
        description = desc,
        jpegTables = rawBytes(TagJPEGTables))
      (parsedIfd, values(TagSubIFDs), next)
    }

    var next = if (big) buf(8, 8).getLong else u32(buf(4, 4))
    val out = Seq.newBuilder[ParsedIfd]
    while (next != 0) {
      if (!visited.add(next))
        throw new IllegalArgumentException(
          s"corrupt TIFF: IFD chain revisits offset $next (cycle)")
      val (main, subOffsets, nxt) = parseOne(next)
      // pyramid levels: each tag-330 value is an entry point that may
      // itself chain (some writers hang all levels off one pointer) —
      // follow and flatten, sharing the cycle guard with the main chain
      val subs = subOffsets.flatMap { so =>
        val lvls = Seq.newBuilder[ParsedIfd]
        var o = so
        while (o != 0) {
          if (!visited.add(o))
            throw new IllegalArgumentException(
              s"corrupt TIFF: SubIFD chain revisits offset $o (cycle)")
          val (sub, _, n2) = parseOne(o)
          lvls += sub
          o = n2
        }
        lvls.result()
      }
      out += main.copy(subIfds = subs)
      next = nxt
    }
    (order, out.result())
  }

  /** Decode one Compression=7 (new-style JPEG, TIFF TTN2) strip/tile into
    * interleaved 8-bit sample bytes via javax.imageio. When the IFD
    * carries a shared JPEGTables stream (tag 347), its table segments are
    * spliced after the segment's SOI (the tables stream is SOI‥EOI; the
    * abbreviated segment stream omits the tables); a segment that carries
    * its own tables decodes the same way — later DQT/DHT definitions
    * simply override the spliced ones. Strips may be shorter than the
    * nominal rows-per-strip (last strip), so only the width is pinned. */
  def decodeJpegSegment(bytes: Array[Byte], tables: Option[Array[Byte]],
      segW: Int, samplesPerPixel: Int): Array[Byte] = {
    val stream = tables match {
      case Some(t) if t.length > 4 =>
        val out = new java.io.ByteArrayOutputStream(t.length + bytes.length)
        out.write(bytes, 0, 2) // SOI from the segment
        out.write(t, 2, t.length - 4) // tables minus their SOI and EOI
        out.write(bytes, 2, bytes.length - 2)
        out.toByteArray
      case _ => bytes
    }
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(stream))
    if (img == null)
      throw new IllegalArgumentException(
        "JPEG-compressed TIFF segment failed to decode")
    val r = img.getRaster
    require(r.getNumBands == samplesPerPixel,
      s"JPEG segment decodes to ${r.getNumBands} bands, IFD declares " +
        s"SamplesPerPixel=$samplesPerPixel")
    require(r.getWidth == segW,
      s"JPEG segment is ${r.getWidth} wide, expected $segW")
    val px = r.getPixels(0, 0, r.getWidth, r.getHeight,
      null.asInstanceOf[Array[Int]])
    val out = new Array[Byte](px.length)
    var i = 0
    while (i < px.length) { out(i) = px(i).toByte; i += 1 }
    out
  }

  /** Decompress + predictor-undo one strip or tile segment into raw sample
    * bytes. `rowSamples` = segment row width × samplesPerPixel. */
  def decodeSegment(bytes: Array[Byte], compression: Int, predictor: Int,
      rowSamples: Int, bits: Int, samplesPerPixel: Int,
      order: ByteOrder, sampleFormat: Int = 1,
      jpegTables: Option[Array[Byte]] = None): Array[Byte] = {
    if (compression == CompressionJpeg) {
      if (bits != 8)
        throw new IllegalArgumentException(
          s"JPEG-in-TIFF supports 8-bit samples, got $bits bits")
      return decodeJpegSegment(bytes, jpegTables,
        segW = rowSamples / samplesPerPixel, samplesPerPixel)
    }
    val raw = decompress(bytes, compression)
    predictor match {
      case 1 => ()
      case 2 if sampleFormat == 3 =>
        // predictor 2 is integer horizontal differencing; applying it to
        // IEEE floats would decode to garbage silently (the spec defines
        // predictor 3 for floats) — never mis-decode, reject instead
        throw new IllegalArgumentException(
          "TIFF predictor 2 (horizontal differencing) is only defined for " +
            "integer samples; this file has SampleFormat=3 (IEEE float)")
      case 2 => undoPredictor(raw, rowSamples, bits, samplesPerPixel, order)
      case 3 if sampleFormat == 3 && (bits == 32 || bits == 64) =>
        undoFloatPredictor(raw, rowSamples, bits, order)
      case 3 => throw new IllegalArgumentException(
        "TIFF predictor 3 (floating-point differencing) is only defined " +
          s"for IEEE float samples; this file has SampleFormat=$sampleFormat" +
          s"/$bits bits")
      case p => throw new IllegalArgumentException(
        s"unsupported TIFF predictor $p (supported: 1, 2, 3)")
    }
    raw
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
