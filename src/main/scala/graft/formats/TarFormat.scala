package graft.formats

import graft.core.UnsupportedFileFormatError

/** Minimal ustar (POSIX.1-1988) tar codec — the container of the
  * WebDataset convention every large multimodal training pipeline
  * ships: one `.tar` shard holds many samples, each sample a group of
  * members sharing a basename key (`0001.png` + `0001.txt`). Only
  * regular-file members are modeled; the 512-byte header/block layout,
  * octal size field, and checksum-over-spaces rule follow the published
  * format (the reference engine has no tar surface — this is extension
  * surface for the training-shard interchange, like .npz for arrays).
  *
  * Whole-shard byte arrays in and out: shards are interchange-sized by
  * construction (the WebDataset discipline caps a shard at what one
  * worker streams), and the SCALE axis is many shards across many
  * workers, not one big shard. */
object TarFormat {

  final case class Member(name: String, data: Array[Byte])

  private val BlockSize = 512

  def parse(bytes: Array[Byte]): Seq[Member] = {
    val out = Seq.newBuilder[Member]
    var off = 0
    var done = false
    while (!done && off + BlockSize <= bytes.length) {
      if ((0 until BlockSize).forall(i => bytes(off + i) == 0)) done = true
      else {
        val name = cstr(bytes, off, 100)
        val prefix = cstr(bytes, off + 345, 155)
        val size = octal(bytes, off + 124, 12)
        val typeflag = bytes(off + 156)
        val magic = cstr(bytes, off + 257, 6)
        if (!magic.startsWith("ustar"))
          throw new UnsupportedFileFormatError(
            s"tar: bad magic '$magic' at offset $off")
        val full = if (prefix.nonEmpty) s"$prefix/$name" else name
        val dataOff = off + BlockSize
        if (dataOff + size > bytes.length)
          throw new UnsupportedFileFormatError(
            s"tar: truncated member '$full' ($size bytes at $dataOff)")
        if (typeflag == '0'.toByte || typeflag == 0.toByte)
          out += Member(full,
            java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + size.toInt))
        off = dataOff + (((size + BlockSize - 1) / BlockSize) * BlockSize).toInt
      }
    }
    out.result()
  }

  def build(members: Seq[Member]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    members.foreach { m =>
      require(m.name.getBytes("UTF-8").length <= 100,
        s"tar member name over 100 bytes: '${m.name}'")
      val h = new Array[Byte](BlockSize)
      putStr(h, 0, m.name)
      putStr(h, 100, "0000644")                    // mode
      putStr(h, 108, "0000000")                    // uid
      putStr(h, 116, "0000000")                    // gid
      putStr(h, 124, f"${m.data.length}%011o")     // size, 11-digit octal
      putStr(h, 136, "00000000000")                // mtime (epoch: determinism)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
      h(156) = '0'.toByte                          // regular file
      putStr(h, 257, "ustar")                      // magic (NUL-terminated)
      h(263) = '0'.toByte; h(264) = '0'.toByte     // version "00"
      val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
      putStr(h, 148, f"$sum%06o")
      h(154) = 0                                    // NUL
      h(155) = ' '.toByte
      bos.write(h)
      bos.write(m.data)
      val pad = (BlockSize - m.data.length % BlockSize) % BlockSize
      bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](2 * BlockSize))       // end-of-archive
    bos.toByteArray
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, "UTF-8")
  }

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    val s = cstr(b, off, len).trim
    if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
  }

  private def putStr(h: Array[Byte], off: Int, s: String): Unit = {
    val sb = s.getBytes("UTF-8")
    System.arraycopy(sb, 0, h, off, sb.length)
  }
}
