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

  def bytesPer(dtype: String): Int = dtype.drop(2).toInt

  def byteOrder(dtype: String): ByteOrder =
    if (dtype.startsWith(">")) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN

  /** Encode one plane of doubles as a raw chunk of the given dtype. */
  def encodeChunk(px: Array[Double], pt: PixelType.Value): Array[Byte] =
    TiffFormat.encodePlane(px, pt) // same little-endian narrowing

  /** Decode a chunk to doubles; `compressor` None = raw, Some("zlib") =
    * zlib-deflated (the one non-native-library zarr codec). */
  def decodeChunk(bytes: Array[Byte], dtype: String,
      compressor: Option[String] = None): Array[Double] = {
    val raw = compressor match {
      case None => bytes
      case Some("zlib") =>
        val inf = new java.util.zip.Inflater()
        inf.setInput(bytes)
        val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && inf.needsInput())
            throw new IllegalArgumentException("truncated zlib chunk")
          out.write(buf, 0, n)
        }
        inf.end()
        out.toByteArray
      case Some(other) =>
        throw new IllegalArgumentException(
          s"unsupported zarr compressor '$other' (supported: null, zlib)")
    }
    val order = byteOrder(dtype)
    val pt = pixelTypeOf(dtype)
    val bits = TiffFormat.bytesPerSample(pt) * 8
    TiffFormat.decodePlane(raw, bits, TiffFormat.sampleFormat(pt), order)
  }

  // --------------------------------------------------------- JSON emit

  val zgroup: String = """{"zarr_format":2}"""

  def zarray(shape: Seq[Long], chunks: Seq[Long], dtype: String): String = {
    s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],""" +
      s""""chunks":[${chunks.mkString(",")}],"dtype":"$dtype",""" +
      """"compressor":null,"fill_value":0,"order":"C","filters":null}"""
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** OME-NGFF 0.4 multiscales + omero channel labels for one image
    * group. `scales` = per-level (t,c,z,y,x) coordinate scale factors. */
  def imageAttrs(name: String, nLevels: Int,
      scale0: Seq[Double], channelNames: Seq[String]): String = {
    val axes =
      """[{"name":"t","type":"time"},{"name":"c","type":"channel"},""" +
        """{"name":"z","type":"space"},{"name":"y","type":"space"},""" +
        """{"name":"x","type":"space"}]"""
    val datasets = (0 until nLevels).map { l =>
      val f = math.pow(2, l)
      val sc = Seq(scale0(0), scale0(1), scale0(2),
        scale0(3) * f, scale0(4) * f)
      s"""{"path":"$l","coordinateTransformations":[{"type":"scale",""" +
        s""""scale":[${sc.mkString(",")}]}]}"""
    }.mkString(",")
    val channels = channelNames.map(c =>
      s"""{"label":"${esc(c)}"}""").mkString(",")
    s"""{"multiscales":[{"version":"0.4","name":"${esc(name)}",""" +
      s""""axes":$axes,"datasets":[$datasets]}],""" +
      s""""omero":{"channels":[$channels]}}"""
  }

  /** Root attrs for a multi-image store (bioformats2raw-style numbered
    * groups). */
  def rootAttrs(nScenes: Int): String =
    s"""{"bioformats2raw.layout":3,"graft":{"scenes":$nScenes}}"""
}
