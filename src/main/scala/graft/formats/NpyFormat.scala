package graft.formats

import java.io.{DataInputStream, EOFException}
import java.nio.charset.StandardCharsets

import graft.core.{PixelType, UnsupportedFileFormatError}

/** NPY (numpy array file) header codec — the `.npy` v1.0/v2.0 format as
  * published in numpy's format specification (numpy/lib/format.py
  * docstring): magic `\x93NUMPY`, one version byte pair, a little-endian
  * header length (u16 for v1, u32 for v2), then an ASCII Python-dict
  * literal `{'descr': '<f8', 'fortran_order': False, 'shape': (3, 4), }`
  * padded with spaces to a 64-byte-aligned total and terminated by
  * `\n`, followed by the raw element bytes.
  *
  * The format is the de-facto interchange for embedding matrices and
  * feature tensors in training-data pipelines, and the natural file form
  * of the reference's ArrayLike domain (numpy arrays,
  * /root/reference/bioio/array_like_reader.py:29-66) — which is why it
  * earns a reader/writer pair here despite not being a microscopy
  * format.
  */
object NpyFormat {

  val Magic: Array[Byte] =
    Array(0x93.toByte, 'N'.toByte, 'U'.toByte, 'M'.toByte, 'P'.toByte,
      'Y'.toByte)

  final case class Header(descr: String, fortranOrder: Boolean,
      shape: Seq[Long]) {
    def rank: Int = shape.length
    def elements: Long = shape.product
  }

  /** descr → (PixelType, bytes per element, big-endian?). Only the fixed
    * numeric dtypes of the engine's PixelType bridge are accepted —
    * unknown descrs raise, mirroring ome_utils' ValueError contract
    * (/root/reference/bioio/ome_utils.py:97-100). */
  def dtypeOf(descr: String): (PixelType.Value, Int, Boolean) = {
    val (endianChar, code) = descr.splitAt(1) match {
      case (e @ ("<" | ">" | "|" | "="), rest) => (e, rest)
      case _ => (null, null)
    }
    if (code == null)
      throw new UnsupportedFileFormatError(s"npy: malformed descr '$descr'")
    // '=' means NATIVE byte order of the writing host — resolve it
    // against this JVM's native order rather than assuming little
    // (numpy itself normalizes to '<'/'>'/'|' on save, but '=' is legal
    // in the descr grammar and a big-endian producer would be silently
    // misdecoded by a little-endian assumption)
    val big = endianChar == ">" ||
      (endianChar == "=" &&
        java.nio.ByteOrder.nativeOrder() == java.nio.ByteOrder.BIG_ENDIAN)
    code match {
      case "i1" => (PixelType.Int8, 1, big)
      case "u1" => (PixelType.UInt8, 1, big)
      case "i2" => (PixelType.Int16, 2, big)
      case "u2" => (PixelType.UInt16, 2, big)
      case "i4" => (PixelType.Int32, 4, big)
      case "u4" => (PixelType.UInt32, 4, big)
      case "f4" => (PixelType.Float32, 4, big)
      case "f8" => (PixelType.Float64, 8, big)
      case other => throw new UnsupportedFileFormatError(
        s"npy: unsupported dtype '$descr' (supported: " +
          "i1/u1/i2/u2/i4/u4/f4/f8)")
    }
  }

  /** PixelType → the little-endian descr the writer emits. */
  def descrOf(pt: PixelType.Value): String = pt match {
    case PixelType.Int8    => "|i1"
    case PixelType.UInt8   => "|u1"
    case PixelType.Int16   => "<i2"
    case PixelType.UInt16  => "<u2"
    case PixelType.Int32   => "<i4"
    case PixelType.UInt32  => "<u4"
    case PixelType.Float32 => "<f4"
    case PixelType.Float64 => "<f8"
    case other => throw new UnsupportedFileFormatError(
      s"npy has no encoding for pixel type $other")
  }

  /** Parse magic + version + header dict off the stream, leaving it
    * positioned at the first element byte. */
  def readHeader(in: DataInputStream): Header = {
    val magic = new Array[Byte](6)
    try in.readFully(magic)
    catch { case _: EOFException =>
      throw new UnsupportedFileFormatError("npy: truncated magic") }
    if (!magic.sameElements(Magic))
      throw new UnsupportedFileFormatError("npy: bad magic")
    val major = in.readUnsignedByte()
    val minor = in.readUnsignedByte()
    if (major < 1 || major > 3)
      throw new UnsupportedFileFormatError(
        s"npy: unsupported format version $major.$minor")
    val headerLen =
      if (major == 1) {
        val lo = in.readUnsignedByte(); val hi = in.readUnsignedByte()
        lo | (hi << 8)
      } else {
        val b = new Array[Byte](4)
        in.readFully(b)
        (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) |
          ((b(3) & 0xff) << 24)
      }
    val hb = new Array[Byte](headerLen)
    in.readFully(hb)
    val text = new String(hb, StandardCharsets.US_ASCII)
    parseDict(text)
  }

  private val DescrRe = """'descr'\s*:\s*'([^']+)'""".r
  private val FortranRe = """'fortran_order'\s*:\s*(True|False)""".r
  private val ShapeRe = """'shape'\s*:\s*\(([^)]*)\)""".r

  /** Parse the three required keys out of the header dict literal. The
    * dict is machine-written by every producer (numpy itself emits it
    * via repr), so anchored regexes are a complete parser for the
    * format's actual population. */
  def parseDict(text: String): Header = {
    val descr = DescrRe.findFirstMatchIn(text).map(_.group(1)).getOrElse(
      throw new UnsupportedFileFormatError(s"npy: header missing descr: $text"))
    val fortran = FortranRe.findFirstMatchIn(text).map(_.group(1) == "True")
      .getOrElse(throw new UnsupportedFileFormatError(
        s"npy: header missing fortran_order: $text"))
    val shapeStr = ShapeRe.findFirstMatchIn(text).map(_.group(1)).getOrElse(
      throw new UnsupportedFileFormatError(s"npy: header missing shape: $text"))
    val shape = shapeStr.split(",").map(_.trim).filter(_.nonEmpty)
      .map(_.toLong).toSeq
    Header(descr, fortran, shape)
  }

  /** Serialize a v1.0 header (magic through the padded dict). */
  def headerBytes(descr: String, shape: Seq[Long]): Array[Byte] = {
    val shapeTuple = shape.length match {
      case 1 => s"(${shape.head},)"
      case _ => shape.mkString("(", ", ", ")")
    }
    val dict =
      s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeTuple, }"
    // total (magic 6 + version 2 + len 2 + dict + pad + '\n') ≡ 0 mod 64
    val unpadded = 10 + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val headerField = dict + (" " * pad) + "\n"
    require(headerField.length < 65536, "npy: header too large for v1.0")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    out.write(1); out.write(0)
    out.write(headerField.length & 0xff)
    out.write((headerField.length >> 8) & 0xff)
    out.write(headerField.getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }
}
