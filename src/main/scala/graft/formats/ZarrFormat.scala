package graft.formats

import java.nio.{ByteBuffer, ByteOrder}

import graft.core.PixelType

/** Zarr v2 / OME-NGFF primitives: dtype strings, chunk codecs, and the
  * JSON metadata documents (.zgroup / .zarray / .zattrs with OME
  * multiscales + omero channels). The format is the public zarr v2 spec +
  * the OME-NGFF 0.4 layout convention (the reference registry's OME-ZARR
  * plugin family, /root/reference/README.md:55-70).
  *
  * Chunks are raw C-order little-endian (compressor null) — each chunk an
  * independent object, which is exactly what makes zarr the
  * parallel-writer-friendly store: executors write/read chunk files
  * directly, no coordination beyond the driver-side metadata documents.
  */
object ZarrFormat {

  val dtypeOf: Map[PixelType.Value, String] = Map(
    PixelType.Int8 -> "|i1", PixelType.UInt8 -> "|u1",
    PixelType.Int16 -> "<i2", PixelType.UInt16 -> "<u2",
    PixelType.Int32 -> "<i4", PixelType.UInt32 -> "<u4",
    PixelType.Float32 -> "<f4", PixelType.Float64 -> "<f8")

  def pixelTypeOf(dtype: String): PixelType.Value = {
    // endianness prefix handled at decode; normalize for the type lookup
    val norm = if (dtype.startsWith(">")) "<" + dtype.drop(1) else dtype
    dtypeOf.map(_.swap).getOrElse(norm,
      throw new IllegalArgumentException(s"Unsupported zarr dtype '$dtype'"))
  }

  /** Zarr v3 data_type name → v2-style dtype string (the internal decode
    * currency), with endianness from the v3 `bytes` codec config. */
  def dtypeOfV3(dataType: String, bigEndian: Boolean): String = {
    val base = dataType match {
      case "int8"    => "i1"
      case "uint8"   => "u1"
      case "int16"   => "i2"
      case "uint16"  => "u2"
      case "int32"   => "i4"
      case "uint32"  => "u4"
      case "float32" => "f4"
      case "float64" => "f8"
      case other => throw new IllegalArgumentException(
        s"Unsupported zarr v3 data_type '$other'")
    }
    (if (base.endsWith("1")) "|" else if (bigEndian) ">" else "<") + base
  }

  /** PixelType → zarr v3 data_type name (the inverse of [[dtypeOfV3]]'s
    * base mapping; endianness lives in the v3 `bytes` codec, not here). */
  val dataTypeV3Of: Map[PixelType.Value, String] = Map(
    PixelType.Int8 -> "int8", PixelType.UInt8 -> "uint8",
    PixelType.Int16 -> "int16", PixelType.UInt16 -> "uint16",
    PixelType.Int32 -> "int32", PixelType.UInt32 -> "uint32",
    PixelType.Float32 -> "float32", PixelType.Float64 -> "float64")

  def bytesPer(dtype: String): Int = dtype.drop(2).toInt

  def byteOrder(dtype: String): ByteOrder =
    if (dtype.startsWith(">")) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN

  /** Encode one plane of doubles as a raw chunk of the given dtype. */
  def encodeChunk(px: Array[Double], pt: PixelType.Value): Array[Byte] =
    TiffFormat.encodePlane(px, pt) // same little-endian narrowing

  // ----------------------------------------------------------- blosc v1
  // c-blosc 1.x chunk container (the numcodecs/bioformats2raw default
  // wrapping): 16-byte header | int32 block starts | per-block compressed
  // split streams. Self-describing — codec, typesize and shuffle come
  // from the header, so no .zarray codec params are needed to decode.
  //
  //   byte 0 version, 1 codec-version, 2 flags, 3 typesize
  //   int32 nbytes | int32 blocksize | int32 cbytes (all little-endian)
  //   flags: bit0 byte-shuffle, bit1 memcpy (stored raw), bits 5-7 codec
  //   format code: 0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd
  //
  // Blocks of `blocksize` bytes are compressed independently; a block is
  // further split into `typesize` streams (each `int32 csize | data`)
  // when the codec is blosclz/lz4, typesize ≤ 16 and blocksize/typesize
  // ≥ 128 — the library's FORWARD_COMPAT split rule, which the
  // decompressor re-derives from the header. A split whose csize equals
  // its uncompressed size is stored raw. Byte-shuffle is applied per
  // block before splitting (transpose of the [elements × typesize] byte
  // matrix); trailing bytes beyond a whole element stay in place.

  private val BloscMemcpy = 0x2
  private val BloscShuffle = 0x1
  private val BloscLz4Format = 1
  private val BloscZlibFormat = 3
  private val BloscZstdFormat = 4

  private def bloscSplits(codec: Int, typesize: Int, blocksize: Int,
      leftoverBlock: Boolean): Int =
    if (!leftoverBlock && (codec == 0 || codec == BloscLz4Format) &&
      typesize <= 16 && typesize > 1 && blocksize / typesize >= 128) typesize
    else 1

  private def unshuffle(typesize: Int, data: Array[Byte]): Array[Byte] = {
    if (typesize <= 1) return data
    val n = data.length / typesize
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < typesize) {
      var i = 0
      while (i < n) {
        out(i * typesize + j) = data(j * n + i)
        i += 1
      }
      j += 1
    }
    // leftover bytes (not a whole element) are stored unshuffled
    var k = n * typesize
    while (k < data.length) { out(k) = data(k); k += 1 }
    out
  }

  private def shuffle(typesize: Int, data: Array[Byte]): Array[Byte] = {
    if (typesize <= 1) return data
    val n = data.length / typesize
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < typesize) {
      var i = 0
      while (i < n) {
        out(j * n + i) = data(i * typesize + j)
        i += 1
      }
      j += 1
    }
    var k = n * typesize
    while (k < data.length) { out(k) = data(k); k += 1 }
    out
  }

  def bloscDecode(chunk: Array[Byte]): Array[Byte] = {
    require(chunk.length >= 16, "truncated blosc chunk")
    val h = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
    h.get() // version
    h.get() // codec version
    val flags = h.get() & 0xff
    val typesize = h.get() & 0xff
    val nbytes = h.getInt
    val blocksize = h.getInt
    h.getInt // cbytes
    if ((flags & BloscMemcpy) != 0)
      return java.util.Arrays.copyOfRange(chunk, 16, 16 + nbytes)
    val codec = (flags >> 5) & 0x7
    require(codec == BloscLz4Format || codec == BloscZlibFormat ||
      codec == BloscZstdFormat,
      s"unsupported blosc inner codec format $codec " +
        "(supported: lz4, zlib, zstd)")
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val bstarts = (0 until nblocks).map(_ => h.getInt)
    val out = new Array[Byte](nbytes)
    val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
    var bi = 0
    while (bi < nblocks) {
      val bsize = math.min(blocksize, nbytes - bi * blocksize)
      val leftover = bsize != blocksize
      val nsplits = bloscSplits(codec, typesize, blocksize, leftover)
      val neblock = bsize / nsplits
      val block = new Array[Byte](bsize)
      var src = bstarts(bi)
      var sp = 0
      while (sp < nsplits) {
        val csize = ByteBuffer.wrap(chunk, src, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        src += 4
        if (csize == neblock)
          System.arraycopy(chunk, src, block, sp * neblock, neblock)
        else codec match {
          case BloscLz4Format =>
            lz4.decompress(chunk, src, block, sp * neblock, neblock)
          case BloscZlibFormat =>
            val raw = TiffFormat.inflate(
              java.util.Arrays.copyOfRange(chunk, src, src + csize))
            require(raw.length == neblock,
              s"blosc zlib split decoded ${raw.length}, expected $neblock")
            System.arraycopy(raw, 0, block, sp * neblock, neblock)
          case BloscZstdFormat =>
            val raw = com.github.luben.zstd.Zstd.decompress(
              java.util.Arrays.copyOfRange(chunk, src, src + csize), neblock)
            require(raw.length == neblock,
              s"blosc zstd split decoded ${raw.length}, expected $neblock")
            System.arraycopy(raw, 0, block, sp * neblock, neblock)
        }
        src += csize
        sp += 1
      }
      val plain =
        if ((flags & BloscShuffle) != 0) unshuffle(typesize, block) else block
      System.arraycopy(plain, 0, out, bi * blocksize, bsize)
      bi += 1
    }
    out
  }

  /** Encode raw chunk bytes as a single-block blosc/lz4 frame with
    * byte-shuffle — the bioformats2raw-default shape. Falls back to the
    * memcpy frame when compression does not pay. */
  def bloscEncode(raw: Array[Byte], typesize: Int): Array[Byte] = {
    val nbytes = raw.length
    val blocksize = nbytes
    val codec = BloscLz4Format
    val shuffled = shuffle(typesize, raw)
    val nsplits = bloscSplits(codec, typesize, blocksize, leftoverBlock = false)
    val neblock = nbytes / nsplits
    val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val splits = (0 until nsplits).map { sp =>
      val src = java.util.Arrays.copyOfRange(shuffled,
        sp * neblock, (sp + 1) * neblock)
      val comp = lz4.compress(src)
      if (comp.length < neblock) (comp.length, comp) else (neblock, src)
    }
    val payload = splits.map(_._2.length + 4).sum
    val total = 16 + 4 + payload // header + 1 bstart + split streams
    if (total >= nbytes + 16) {
      // incompressible: memcpy frame
      val b = ByteBuffer.allocate(16 + nbytes).order(ByteOrder.LITTLE_ENDIAN)
      b.put(2.toByte).put(1.toByte)
        .put(BloscMemcpy.toByte).put(typesize.toByte)
      b.putInt(nbytes).putInt(blocksize).putInt(16 + nbytes)
      b.put(raw)
      b.array()
    } else {
      val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      val flags = (BloscShuffle | (codec << 5)).toByte
      b.put(2.toByte).put(1.toByte).put(flags).put(typesize.toByte)
      b.putInt(nbytes).putInt(blocksize).putInt(total)
      b.putInt(20) // single block starts after header + 1 bstart entry
      splits.foreach { case (csize, data) =>
        b.putInt(csize)
        b.put(data, 0, data.length)
      }
      b.array()
    }
  }

  /** RFC-1952 gzip (the zarr v3 `gzip` codec — distinct from v2's
    * zlib-wrapped `zlib` codec). */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4 + 64)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** Decode a chunk to doubles; `compressor` None = raw, Some("zlib") =
    * zlib-deflated (v2), Some("gzip") = gzip (v3), Some("blosc") =
    * c-blosc 1.x frame (lz4/zlib/zstd inner codecs — the NGFF-ecosystem
    * default), Some("zstd") = a bare zstd frame. */
  def decodeChunk(bytes: Array[Byte], dtype: String,
      compressor: Option[String] = None): Array[Double] = {
    val raw = compressor match {
      case None          => bytes
      case Some("zlib")  => TiffFormat.inflate(bytes)
      case Some("gzip")  => gunzip(bytes)
      case Some("blosc") => bloscDecode(bytes)
      case Some("zstd") =>
        val size = com.github.luben.zstd.Zstd.getFrameContentSize(bytes)
        require(size > 0 && size < Int.MaxValue,
          s"zstd zarr chunk with unknown content size $size")
        com.github.luben.zstd.Zstd.decompress(bytes, size.toInt)
      case Some(other) =>
        throw new IllegalArgumentException(
          s"unsupported zarr compressor '$other' " +
            "(supported: null, zlib, gzip, blosc, zstd)")
    }
    val order = byteOrder(dtype)
    val pt = pixelTypeOf(dtype)
    val bits = TiffFormat.bytesPerSample(pt) * 8
    TiffFormat.decodePlane(raw, bits, TiffFormat.sampleFormat(pt), order)
  }

  /** Encode raw chunk bytes with the given compressor id. */
  def compressChunk(raw: Array[Byte], compressor: Option[String],
      typesize: Int): Array[Byte] = compressor match {
    case None          => raw
    case Some("zlib")  => zlibDeflate(raw)
    case Some("gzip")  => gzipDeflate(raw)
    case Some("blosc") => bloscEncode(raw, typesize)
    case Some("zstd")  => com.github.luben.zstd.Zstd.compress(raw, 3)
    case Some(other) =>
      throw new IllegalArgumentException(
        s"unsupported zarr compressor '$other' " +
          "(supported: null, zlib, gzip, blosc, zstd)")
  }

  /** RFC-1952 gzip encode (the zarr v3 `gzip` codec's wire format). */
  def gzipDeflate(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    try gz.write(raw) finally gz.close()
    bos.toByteArray
  }

  /** zlib-wrapped deflate (the numcodecs "zlib" codec). */
  def zlibDeflate(raw: Array[Byte]): Array[Byte] = TiffFormat.deflate(raw)

  /** numcodecs compressor config for the .zarray document. */
  def compressorJson(compressor: Option[String]): String = compressor match {
    case None          => "null"
    case Some("zlib")  => """{"id":"zlib","level":6}"""
    case Some("zstd")  => """{"id":"zstd","level":3}"""
    case Some("blosc") =>
      """{"id":"blosc","cname":"lz4","clevel":5,"shuffle":1,"blocksize":0}"""
    case Some(other) =>
      throw new IllegalArgumentException(s"unsupported compressor '$other'")
  }

  // --------------------------------------------------------- JSON emit

  val zgroup: String = """{"zarr_format":2}"""

  def zarray(shape: Seq[Long], chunks: Seq[Long], dtype: String,
      compressor: Option[String] = None): String = {
    s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],""" +
      s""""chunks":[${chunks.mkString(",")}],"dtype":"$dtype",""" +
      s""""compressor":${compressorJson(compressor)},""" +
      """"fill_value":0,"order":"C","filters":null}"""
  }

  // ------------------------------------------------------ v3 JSON emit

  /** v3 codec config for the array node's `codecs` chain (distinct ids
    * from v2's numcodecs configs: `gzip` not `zlib`, typed blosc
    * shuffle). `typesize` feeds blosc's shuffle declaration. */
  def codecJsonV3(compressor: Option[String], typesize: Int): String = {
    val bytes = """{"name":"bytes","configuration":{"endian":"little"}}"""
    compressor match {
      case None         => s"[$bytes]"
      case Some("gzip") => s"""[$bytes,{"name":"gzip","configuration":{"level":6}}]"""
      case Some("zstd") =>
        s"""[$bytes,{"name":"zstd","configuration":{"level":3,"checksum":false}}]"""
      case Some("blosc") =>
        s"""[$bytes,{"name":"blosc","configuration":{"cname":"lz4",""" +
          s""""clevel":5,"shuffle":"shuffle","typesize":$typesize,""" +
          """"blocksize":0}}]"""
      case Some(other) =>
        throw new IllegalArgumentException(
          s"unsupported zarr v3 compressor '$other' " +
            "(supported: null, gzip, zstd, blosc)")
    }
  }

  /** Zarr v3 group node carrying the given attributes JSON object. */
  def zarrJsonGroup(attrs: String): String =
    s"""{"zarr_format":3,"node_type":"group","attributes":$attrs}"""

  /** Zarr v3 array node. `chunks` is the stored-object (chunk-grid)
    * shape; `shardInner`, when present, declares a `sharding_indexed`
    * leading codec whose inner chunks are the read unit (little-endian
    * offset+nbytes index at the shard END, crc32c-checksummed — the
    * layout the reader's ranged-read path expects). Default chunk-key
    * encoding: "c" prefix, "/" separator. */
  def zarrJsonArray(shape: Seq[Long], chunks: Seq[Long], dataType: String,
      compressor: Option[String], typesize: Int, dimNames: Seq[String],
      shardInner: Option[Seq[Long]] = None): String = {
    val inner = codecJsonV3(compressor, typesize)
    val codecs = shardInner match {
      case None => inner
      case Some(ic) =>
        s"""[{"name":"sharding_indexed","configuration":{""" +
          s""""chunk_shape":[${ic.mkString(",")}],"codecs":$inner,""" +
          """"index_codecs":[{"name":"bytes","configuration":""" +
          """{"endian":"little"}},{"name":"crc32c"}],""" +
          """"index_location":"end"}}]"""
    }
    val names = dimNames.map(n => s""""${esc(n)}"""").mkString(",")
    s"""{"zarr_format":3,"node_type":"array",""" +
      s""""shape":[${shape.mkString(",")}],"data_type":"$dataType",""" +
      s""""chunk_grid":{"name":"regular","configuration":""" +
      s"""{"chunk_shape":[${chunks.mkString(",")}]}},""" +
      """"chunk_key_encoding":{"name":"default",""" +
      """"configuration":{"separator":"/"}},"fill_value":0,""" +
      s""""codecs":$codecs,"dimension_names":[$names]}"""
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** OME-NGFF 0.4 multiscales + omero channel labels for one image
    * group. `scale0` = level-0 (t,c,z,y,x) coordinate scale factors.
    * `sSamples` > 1 appends a trailing sample axis (a graft extension —
    * NGFF has no sample axis; RGB payloads keep their S dim this way).
    * `timeUnit`/`spaceUnit` emit NGFF axes[].unit — their PRESENCE is
    * also the declaration that the t scale / pixel sizes are real values
    * (so a genuine 1.0-second interval survives a roundtrip instead of
    * colliding with the no-interval default scale of 1.0). */
  def imageAttrs(name: String, nLevels: Int,
      scale0: Seq[Double], channelNames: Seq[String],
      sSamples: Int = 1, timeUnit: Option[String] = None,
      spaceUnit: Option[String] = None,
      ngffVersion: String = "0.4"): String = {
    def u(unit: Option[String]): String =
      unit.fold("")(v => s""","unit":"${esc(v)}"""")
    val axes =
      s"""[{"name":"t","type":"time"${u(timeUnit)}},""" +
        """{"name":"c","type":"channel"},""" +
        s"""{"name":"z","type":"space"${u(spaceUnit)}},""" +
        s"""{"name":"y","type":"space"${u(spaceUnit)}},""" +
        s"""{"name":"x","type":"space"${u(spaceUnit)}}""" +
        (if (sSamples > 1) """,{"name":"s","type":"sample"}]""" else "]")
    val datasets = (0 until nLevels).map { l =>
      val f = math.pow(2, l)
      val sc = Seq(scale0(0), scale0(1), scale0(2),
        scale0(3) * f, scale0(4) * f) ++
        (if (sSamples > 1) Seq(1.0) else Seq.empty)
      s"""{"path":"$l","coordinateTransformations":[{"type":"scale",""" +
        s""""scale":[${sc.mkString(",")}]}]}"""
    }.mkString(",")
    val channels = channelNames.map(c =>
      s"""{"label":"${esc(c)}"}""").mkString(",")
    // NGFF 0.4 declares the version inside each multiscales entry; 0.5
    // moved it to the top of the "ome" namespace and removed the
    // per-multiscale field — conformant validators key off the new spot
    val top = if (ngffVersion == "0.5") s""""version":"0.5",""" else ""
    val msv =
      if (ngffVersion == "0.5") "" else s""""version":"$ngffVersion","""
    s"""{$top"multiscales":[{$msv"name":"${esc(name)}",""" +
      s""""axes":$axes,"datasets":[$datasets]}],""" +
      s""""omero":{"channels":[$channels]}}"""
  }

  /** Root attrs for a multi-image store (bioformats2raw-style numbered
    * groups). */
  def rootAttrs(nScenes: Int): String =
    s"""{"bioformats2raw.layout":3,"graft":{"scenes":$nScenes}}"""
}
