package graft.formats

import java.nio.{ByteBuffer, ByteOrder}

import graft.core.{PixelType, UnsupportedFileFormatError}

/** MRC2014 header codec — the MRC/CCP-EM map format as published in the
  * MRC2014 specification (Cheng et al., "MRC2014: Extensions to the MRC
  * format header for electron cryo-microscopy and tomography", J.
  * Struct. Biol. 192(2), and the CCP-EM format page): a fixed 1024-byte
  * header of 56 four-byte words plus ten 80-char labels, an optional
  * extended header of `nsymbt` bytes, then the dense section data with
  * columns (X) fastest, rows (Y) next, sections (Z/T) slowest — exactly
  * the C-order [sections, ny, nx] array this engine's plane model wants.
  *
  * Endianness is self-describing via the machine stamp at bytes
  * 212-215 (0x44 .. little-endian, 0x11 .. big-endian), validated
  * together with the "MAP " tag at bytes 208-211; both byte orders
  * parse. Supported modes are the exact-integer/float subset of the
  * engine's PixelType bridge: 0 (int8), 1 (int16), 2 (float32),
  * 6 (uint16). Complex modes (3, 4), packed 4-bit (101) and float16
  * (12) are REJECTED loudly.
  *
  * In-family rationale: MRC is the microscopy/cryo-EM cousin of the
  * reference's OME-TIFF/zarr surface (an aicsimageio/bioio plugin format
  * family member), with a public spec small enough to pin byte-for-byte
  * in tests.
  */
object MrcFormat {

  /** Total fixed header size (bytes) before the extended header. */
  val HeaderSize = 1024

  final case class Header(
      nx: Int, ny: Int, nz: Int, mode: Int,
      mx: Int, my: Int, mz: Int,
      cellX: Float, cellY: Float, cellZ: Float,
      mapc: Int, mapr: Int, maps: Int,
      dmin: Float, dmax: Float, dmean: Float,
      ispg: Int, nsymbt: Int, rms: Float,
      nlabl: Int, labels: Seq[String], bigEndian: Boolean) {
    /** Image stack (ISPG 0: sections are timepoints/frames) vs volume
      * (ISPG >= 1: sections are Z slices) — the MRC2014 distinction. */
    def isStack: Boolean = ispg == 0
    /** Voxel size along (z, y, x) in ångström (cell / sampling grid),
      * when the sampling grid is declared. */
    def voxelSize: Option[(Double, Double, Double)] =
      if (mx > 0 && my > 0 && mz > 0 && (cellX > 0 || cellY > 0 || cellZ > 0))
        Some((cellZ.toDouble / mz, cellY.toDouble / my, cellX.toDouble / mx))
      else None
  }

  /** mode → (PixelType, bytes per element). */
  def dtypeOf(mode: Int): (PixelType.Value, Int) = mode match {
    case 0 => (PixelType.Int8, 1)
    case 1 => (PixelType.Int16, 2)
    case 2 => (PixelType.Float32, 4)
    case 6 => (PixelType.UInt16, 2)
    case 3 | 4 => throw new UnsupportedFileFormatError(
      s"mrc: complex mode $mode is not supported")
    case other => throw new UnsupportedFileFormatError(
      s"mrc: unsupported mode $other (supported: 0 int8, 1 int16, " +
        "2 float32, 6 uint16)")
  }

  /** PixelType → mode, rejecting types MRC cannot hold exactly (the
    * TwoDWriter no-16-bit-JPEG precedent: never silently narrow).
    * UInt8 widens exactly into mode 6. Float64 maps to mode 2 — MRC has
    * no 64-bit mode — but the writer VERIFIES every value is float32-
    * representable and raises otherwise, so the narrowing is never
    * silent. */
  def modeOf(pt: PixelType.Value): Int = pt match {
    case PixelType.Int8    => 0
    case PixelType.Int16   => 1
    case PixelType.UInt8   => 6
    case PixelType.UInt16  => 6
    case PixelType.Float32 | PixelType.Float64 => 2
    case other => throw new UnsupportedFileFormatError(
      s"mrc has no exact mode for pixel type $other " +
        "(supported: Int8, Int16, UInt8, UInt16, Float32, " +
        "float32-representable Float64)")
  }

  /** Parse a 1024-byte header block. The machine stamp is read FIRST
    * (byte 212: 0x44 little-endian, 0x11 big-endian) so the integer and
    * float words decode in the file's own byte order; the "MAP " tag
    * gates both against garbage. */
  def parseHeader(block: Array[Byte]): Header = {
    require(block.length >= HeaderSize, s"mrc: short header ${block.length}")
    val tag = new String(block, 208, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag != "MAP ")
      throw new UnsupportedFileFormatError(
        s"mrc: missing 'MAP ' tag at byte 208 (got '$tag')")
    val big = (block(212) & 0xff) match {
      case 0x44 => false
      case 0x11 => true
      case other => throw new UnsupportedFileFormatError(
        f"mrc: unrecognized machine stamp 0x$other%02x")
    }
    val bb = ByteBuffer.wrap(block)
      .order(if (big) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val nlabl = bb.getInt(220)
    val labels = (0 until math.max(0, math.min(10, nlabl))).map { i =>
      new String(block, 224 + i * 80, 80,
        java.nio.charset.StandardCharsets.US_ASCII).trim
    }
    Header(
      nx = bb.getInt(0), ny = bb.getInt(4), nz = bb.getInt(8),
      mode = bb.getInt(12),
      mx = bb.getInt(28), my = bb.getInt(32), mz = bb.getInt(36),
      cellX = bb.getFloat(40), cellY = bb.getFloat(44),
      cellZ = bb.getFloat(48),
      mapc = bb.getInt(64), mapr = bb.getInt(68), maps = bb.getInt(72),
      dmin = bb.getFloat(76), dmax = bb.getFloat(80),
      dmean = bb.getFloat(84),
      ispg = bb.getInt(88), nsymbt = bb.getInt(92),
      rms = bb.getFloat(216), nlabl = nlabl, labels = labels,
      bigEndian = big)
  }

  /** Serialize a little-endian MRC2014 header (the writer always emits
    * LE + NVERSION 20140; the reader accepts both orders). */
  def headerBytes(h: Header): Array[Byte] = {
    val block = new Array[Byte](HeaderSize)
    val bb = ByteBuffer.wrap(block).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0, h.nx); bb.putInt(4, h.ny); bb.putInt(8, h.nz)
    bb.putInt(12, h.mode)
    // nxstart/nystart/nzstart stay 0 (words 5-7)
    bb.putInt(28, h.mx); bb.putInt(32, h.my); bb.putInt(36, h.mz)
    bb.putFloat(40, h.cellX); bb.putFloat(44, h.cellY)
    bb.putFloat(48, h.cellZ)
    bb.putFloat(52, 90f); bb.putFloat(56, 90f); bb.putFloat(60, 90f)
    bb.putInt(64, 1); bb.putInt(68, 2); bb.putInt(72, 3)
    bb.putFloat(76, h.dmin); bb.putFloat(80, h.dmax)
    bb.putFloat(84, h.dmean)
    bb.putInt(88, h.ispg); bb.putInt(92, h.nsymbt)
    bb.putInt(108, 20140) // NVERSION
    block(208) = 'M'; block(209) = 'A'; block(210) = 'P'; block(211) = ' '
    block(212) = 0x44; block(213) = 0x44 // LE machine stamp
    bb.putFloat(216, h.rms)
    val labels = h.labels.take(10)
    bb.putInt(220, labels.length)
    labels.zipWithIndex.foreach { case (l, i) =>
      val padded = l.take(80).padTo(80, ' ')
      System.arraycopy(
        padded.getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0,
        block, 224 + i * 80, 80)
    }
    block
  }
}
