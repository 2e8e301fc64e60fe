package graft.formats

import graft.core.UnsupportedFileFormatError

/** Minimal RIFF/AVI codec for UNCOMPRESSED (BI_RGB 24-bit DIB) video —
  * the video-CONTAINER time series the reference's TimeSeriesWriter
  * family points at (.mp4/.mkv need external codecs and stay out of a
  * zero-dependency build; raw-DIB AVI is pure published container
  * layout, like ustar or MRC): RIFF 'AVI ' → LIST hdrl (avih main
  * header, LIST strl with a 'vids'/'DIB ' stream header + 40-byte
  * BITMAPINFOHEADER) → LIST movi ('00db' frame chunks: bottom-up BGR
  * rows padded to 4 bytes) → idx1. Everything little-endian; chunks
  * pad to even offsets per RIFF.
  *
  * Frames cross this API as top-down row-major (y, x, sample) arrays
  * with 3 samples (gray writes r=g=b); values 0..255. */
object AviFormat {

  final case class Video(width: Int, height: Int, fps: Int,
      /** frames(t)(y*width*3 + x*3 + s) with s in RGB order, top-down */
      frames: Seq[Array[Int]])

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def rowBytes(w: Int): Int = ((w * 3 + 3) / 4) * 4

  def build(v: Video): Array[Byte] = {
    require(v.frames.nonEmpty, "avi: no frames")
    require(v.frames.forall(_.length == v.width * v.height * 3),
      "avi: frame size mismatch")
    val frameSize = rowBytes(v.width) * v.height

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fourcc(id) ++ le32(body.length) ++ body ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ le32(body.length + 4) ++ fourcc(kind) ++ body

    val avih = chunk("avih",
      le32(1000000 / v.fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(v.frames.length) ++ le32(0) ++ le32(1) ++ le32(frameSize) ++
        le32(v.width) ++ le32(v.height) ++ new Array[Byte](16))
    val strh = chunk("strh",
      fourcc("vids") ++ fourcc("DIB ") ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(1) ++ le32(v.fps) ++ le32(0) ++
        le32(v.frames.length) ++ le32(frameSize) ++ le32(-1) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(v.width) ++ le16(v.height))
    val strf = chunk("strf",
      le32(40) ++ le32(v.width) ++ le32(v.height) ++ le16(1) ++ le16(24) ++
        le32(0) ++ le32(frameSize) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    val frameChunks = v.frames.map { f =>
      val data = new Array[Byte](frameSize)
      val rb = rowBytes(v.width)
      var y = 0
      while (y < v.height) {
        val srcRow = v.height - 1 - y // bottom-up
        var x = 0
        while (x < v.width) {
          val base = (srcRow * v.width + x) * 3
          data(y * rb + x * 3) = clamp(f(base + 2))     // B
          data(y * rb + x * 3 + 1) = clamp(f(base + 1)) // G
          data(y * rb + x * 3 + 2) = clamp(f(base))     // R
          x += 1
        }
        y += 1
      }
      chunk("00db", data)
    }
    val movi = list("movi", frameChunks.flatten.toArray)

    // idx1: offsets are from the start of the movi LIST's 'movi' fourcc
    var off = 4
    val idxEntries = frameChunks.map { fc =>
      val e = fourcc("00db") ++ le32(0x10) ++ le32(off) ++
        le32(fc.length - 8)
      off += fc.length
      e
    }
    val idx1 = chunk("idx1", idxEntries.flatten.toArray)

    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  private def clamp(v: Int): Byte = math.min(255, math.max(0, v)).toByte

  def parse(bytes: Array[Byte]): Video = {
    def ri32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def cc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (bytes.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ")
      throw new UnsupportedFileFormatError("avi: not a RIFF AVI file")

    var width = -1
    var height = -1
    var fps = 25
    val frames = Seq.newBuilder[Array[Byte]]

    def walk(off0: Int, end0: Int): Unit = {
      val end = math.min(end0, bytes.length)
      var off = off0
      while (off + 8 <= end) {
        val id = cc(off)
        val sz = ri32(off + 4)
        // explicit bound: Arrays.copyOfRange would silently zero-pad a
        // truncated tail instead of failing
        if (sz < 0 || off + 8 + sz > bytes.length)
          throw new UnsupportedFileFormatError(
            s"avi: truncated chunk '$id' ($sz bytes at $off)")
        if (id == "LIST") walk(off + 12, off + 8 + sz)
        else id match {
          case "strf" =>
            width = ri32(off + 8 + 4)
            height = ri32(off + 8 + 8)
            val bitCount = (bytes(off + 8 + 14) & 0xff) |
              ((bytes(off + 8 + 15) & 0xff) << 8)
            val compression = ri32(off + 8 + 16)
            if (bitCount != 24 || compression != 0)
              throw new UnsupportedFileFormatError(
                s"avi: only uncompressed 24-bit BI_RGB is supported, " +
                  s"got bitCount=$bitCount compression=$compression")
          case "strh" =>
            val scale = ri32(off + 8 + 20)
            val rate = ri32(off + 8 + 24)
            if (scale > 0 && rate > 0) fps = math.max(1, rate / scale)
          case "00db" | "00dc" =>
            frames += java.util.Arrays.copyOfRange(bytes, off + 8,
              off + 8 + sz)
          case _ => ()
        }
        off += 8 + sz + (sz % 2)
      }
    }
    walk(12, 12 + ri32(4) - 4)

    if (width <= 0 || height <= 0)
      throw new UnsupportedFileFormatError("avi: missing strf header")
    val fs = frames.result()
    if (fs.isEmpty)
      throw new UnsupportedFileFormatError("avi: no frame chunks")
    val rb = rowBytes(width)
    val decoded = fs.map { data =>
      if (data.length < rb * height)
        throw new UnsupportedFileFormatError(
          s"avi: truncated frame (${data.length} < ${rb * height})")
      val out = new Array[Int](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = height - 1 - y
        var x = 0
        while (x < width) {
          val b = data(srcRow * rb + x * 3) & 0xff
          val g = data(srcRow * rb + x * 3 + 1) & 0xff
          val r = data(srcRow * rb + x * 3 + 2) & 0xff
          val base = (y * width + x) * 3
          out(base) = r; out(base + 1) = g; out(base + 2) = b
          x += 1
        }
        y += 1
      }
      out
    }
    Video(width, height, fps, decoded)
  }
}
