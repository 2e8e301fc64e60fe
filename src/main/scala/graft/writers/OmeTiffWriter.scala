package graft.writers

import java.io.BufferedOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions.col

import graft.core.PixelType
import graft.formats.TiffFormat
import graft.image.BioImage
import graft.meta.{OME, OmeChannel, OmeImage, OmePixels, OmeXml}

/** Write-side layout options: Compression tag value (none/LZW/deflate),
  * optional tile organization as (tileWidth, tileLength) — both must be
  * multiples of 16 per TIFF 6.0 — and BigTIFF (version 43, 8-byte
  * offsets), which lifts the classic 4 GiB file ceiling. */
final case class TiffOptions(
    compression: Int = TiffFormat.CompressionNone,
    tile: Option[(Int, Int)] = None,
    bigTiff: Boolean = false)

/** OME-TIFF sink — the reference's canonical `BioImage.save` target
  * (/root/reference/bioio/bio_image.py:1229-1301): selected scenes are
  * renumbered ("Image:{i}"), order preserved, per-scene channel names and
  * physical pixel sizes carried into the OME-XML, which lives in the first
  * IFD's ImageDescription.
  *
  * Layout streams in one sequential pass with per-plane interleaving:
  * header | OME-XML | IFD₀ data₀ | IFD₁ data₁ | … Each plane's segment
  * sizes (compressed strips or tiles) are known the moment the plane is
  * encoded, so every offset is computed just-in-time — no seeks, so any
  * Hadoop FileSystem target works (file:, hdfs:, s3a:). Plane data is
  * pulled scene-by-scene through `toLocalIterator` in (t,c,z) order
  * matching DimensionOrder XYZCT — the driver is a streaming conduit, one
  * plane in memory at a time, the same single-file serialization boundary
  * as the reference's dask → tifffile write. The Parquet plane store is
  * the parallel-writer scale path; OME-TIFF is the interchange sink.
  */
object OmeTiffWriter extends BioWriter {
  override def name: String = "OmeTiffWriter"
  override def supportedExtensions: Seq[String] =
    Seq(".ome.tiff", ".ome.tif", ".tiff", ".tif")

  override def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]]): Unit =
    save(img, uri, selectScenes, TiffOptions())

  def save(img: BioImage, uri: String, selectScenes: Option[Seq[String]],
      opts: TiffOptions): Unit = {
    require(TiffFormat.compressionSupported(opts.compression),
      s"unsupported TIFF compression ${opts.compression}")
    opts.tile.foreach { case (tw, tl) =>
      require(tw > 0 && tl > 0 && tw % 16 == 0 && tl % 16 == 0,
        s"TIFF tile dims must be positive multiples of 16, got ${tw}x$tl")
    }
    val sel = Writers.validateSelection(img, selectScenes)

    val saved = img.currentSceneIndex
    // per-scene layout facts from the catalog (no data scan)
    case class SceneLayout(origIdx: Int, t: Int, c: Int, z: Int, h: Int,
        w: Int, nS: Int, pt: PixelType.Value, channelNames: Seq[String],
        pps: Option[(Double, Double, Double)], timeInterval: Option[Double])
    val layouts = sel.zipWithIndex.map { case (sid, renum) =>
      img.setScene(sid)
      val m = img.meta
      val d = img.dims
      val nS = if (d.order.contains('S')) d('S').toInt else 1
      if (nS != 1 && nS != 3)
        throw new UnsupportedOperationException(
          s"TIFF supports 1 (gray) or 3 (RGB chunky) samples, got S=$nS")
      SceneLayout(img.currentSceneIndex, d('T').toInt, d('C').toInt,
        d('Z').toInt, d('Y').toInt, d('X').toInt, nS, m.pixelType,
        img.channelNames, m.physicalPixelSizes, m.timeInterval)
    }
    img.setScene(saved)

    // OME-XML with regenerated ids, order preserved
    val ome = OME(layouts.zipWithIndex.map { case (s, i) =>
      OmeImage(s"Image:$i", sel(i), OmePixels(
        id = s"Pixels:$i", dimensionOrder = "XYZCT",
        pixelType = OmeXml.omeTypeOf(s.pt),
        sizeX = s.w, sizeY = s.h, sizeZ = s.z, sizeC = s.c, sizeT = s.t,
        physicalSizeX = s.pps.map(_._3), physicalSizeY = s.pps.map(_._2),
        physicalSizeZ = s.pps.map(_._1), timeIncrement = s.timeInterval,
        channels = s.channelNames.zipWithIndex.map { case (cn, ci) =>
          OmeChannel(s"Channel:$i:$ci", Some(cn))
        }))
    })
    // ASCII field payload: XML + NUL terminator
    val xmlBytes =
      OmeXml.toXml(ome).getBytes(StandardCharsets.UTF_8) :+ 0.toByte
    val xmlPadded = xmlBytes.length + (xmlBytes.length & 1)
    val big = opts.bigTiff
    val offType = if (big) TiffFormat.TypeLong8 else TiffFormat.TypeLong
    val offSize = if (big) 8 else 4
    val xmlOffset = if (big) 16L else 8L

    val planeCounts = layouts.map(s => s.t * s.c * s.z)
    val totalPlanes = planeCounts.sum

    // uncompressed classic-TIFF sizes are exactly computable up front —
    // reject oversized saves BEFORE truncating the destination (the
    // in-loop guard still covers compressed writes, whose sizes are only
    // known as planes stream)
    if (!big && opts.compression == TiffFormat.CompressionNone) {
      val estimate = xmlOffset + xmlPadded + layouts.zip(planeCounts).map {
        case (s, n) =>
          val raw = s.h.toLong * s.w * s.nS * TiffFormat.bytesPerSample(s.pt)
          n.toLong * (TiffFormat.ifdSize(12) + 2L * 2 * s.nS + raw + raw % 2 +
            16L * ((s.h / 16 + 1) * (s.w / 16 + 1))) // tile-array slack
      }.sum
      require(estimate < (1L << 32),
        "image exceeds classic TIFF 4 GiB limit — write with " +
          "TiffOptions(bigTiff = true) or use the parquet plane store")
    }

    val dest = new Path(uri)
    val fs = FileSystem.get(dest.toUri,
      img.spark.sparkContext.hadoopConfiguration)
    // stream into a temporary sibling and promote on success: the in-loop
    // 4 GiB guard (or any mid-write failure) must never leave a truncated
    // partial at the destination or destroy an existing file there
    val tmp = new Path(Option(dest.getParent).getOrElse(new Path("/")),
      "." + dest.getName + ".tmp-" +
        java.util.UUID.randomUUID().toString.take(8))
    val out = new BufferedOutputStream(fs.create(tmp, true), 1 << 20)
    try {
      try {
      var pos = 0L
      def write(b: Array[Byte]): Unit = { out.write(b); pos += b.length }

      write(TiffFormat.headerBytes(xmlOffset + xmlPadded, big))
      write(xmlBytes)
      if (xmlPadded > xmlBytes.length) write(Array[Byte](0))

      var planeIdx = 0
      layouts.zipWithIndex.foreach { case (s, i) =>
        img.setScene(s.origIdx)
        val bps = TiffFormat.bytesPerSample(s.pt)
        val nS = s.nS
        val it = img.stitchedPlanes
          .select(col("t"), col("c"), col("z"), col("s"), col("pixels"))
          .orderBy(col("t"), col("c"), col("z"), col("s"))
          .toLocalIterator()
        var seen = 0
        while (it.hasNext) {
          // one output IFD = nS consecutive sample rows of one (t,c,z),
          // interleaved chunky (RGBRGB…) per TIFF PlanarConfiguration=1
          val px = new Array[Double](s.h * s.w * nS)
          var si = 0
          var tcz: (Int, Int, Int) = null
          while (si < nS) {
            require(it.hasNext,
              s"scene ${sel(i)}: plane rows ended mid-sample-group " +
                s"(after $seen complete planes, sample $si of $nS)")
            val row = it.next()
            val key = (row.getInt(0), row.getInt(1), row.getInt(2))
            if (tcz == null) tcz = key
            else require(key == tcz,
              s"scene ${sel(i)}: sample rows out of order at $key vs $tcz")
            require(row.getInt(3) == si,
              s"scene ${sel(i)}: expected sample $si, got ${row.getInt(3)}")
            val band = row.getSeq[Double](4)
            require(band.length == s.h * s.w,
              s"scene ${sel(i)}: plane has ${band.length} pixels, " +
                s"expected ${s.h}x${s.w}")
            var k = 0
            while (k < band.length) {
              px(k * nS + si) = band(k)
              k += 1
            }
            si += 1
          }

          // encode + compress this plane's segments: ~256 KiB strips (so
          // strip-streaming readers never buffer a whole plane), or tiles
          val rowBytes = math.max(1, s.w * nS * bps)
          val rps = math.max(1, math.min(s.h, (256 * 1024) / rowBytes))
          val segments: Seq[Array[Byte]] = opts.tile match {
            case None =>
              val nStrips = (s.h + rps - 1) / rps
              (0 until nStrips).map { si =>
                val r0 = si * rps
                val rN = math.min(rps, s.h - r0)
                val slice = java.util.Arrays.copyOfRange(px,
                  r0 * s.w * nS, (r0 + rN) * s.w * nS)
                TiffFormat.compress(
                  TiffFormat.encodePlane(slice, s.pt), opts.compression,
                  rowBytes = rowBytes)
              }
            case Some((tw, tl)) =>
              val nx = (s.w + tw - 1) / tw
              val ny = (s.h + tl - 1) / tl
              val rowSamples = s.w * nS
              for { yi <- 0 until ny; xi <- 0 until nx } yield {
                // tiles are stored at full tile size, zero-padded at edges
                val tile = new Array[Double](tl * tw * nS)
                val hEff = math.min(tl, s.h - yi * tl)
                val wEff = math.min(tw, s.w - xi * tw)
                var r = 0
                while (r < hEff) {
                  System.arraycopy(px, (yi * tl + r) * rowSamples + xi * tw * nS,
                    tile, r * tw * nS, wEff * nS)
                  r += 1
                }
                TiffFormat.compress(
                  TiffFormat.encodePlane(tile, s.pt), opts.compression,
                  rowBytes = tw * nS * bps)
              }
          }
          val segPadded = segments.map(b => b.length + (b.length & 1))

          // entries minus the data-offset values, to size the IFD; when
          // nS > 1 the BitsPerSample/SampleFormat value arrays (3 shorts)
          // live out-of-line right after the IFD
          val baseEntryCount = if (planeIdx == 0) 8 else 7
          val n = segments.length
          val layoutEntryCount = opts.tile match {
            case None    => 3 // StripOffsets, RowsPerStrip, StripByteCounts
            case Some(_) => 4 // TileWidth, TileLength, TileOffsets, TileByteCounts
          }
          val nEntries = baseEntryCount + layoutEntryCount
          val ifdOff = pos
          val ifdSize = TiffFormat.ifdSize(nEntries, big)
          // BigTIFF's 8-byte value slot holds 3 shorts INLINE (BigTIFF
          // requires inline when the data fits); classic TIFF's 4-byte
          // slot cannot, so the arrays go out-of-line after the IFD
          val shortOol = if (nS > 1 && !big) 2 * 2 * nS else 0
          // offset/bytecount arrays (strips or tiles) when >1 segment
          val tileOol = if (n > 1) 2 * offSize * n else 0
          val bitsArrOff = ifdOff + ifdSize
          val sfArrOff = bitsArrOff + 2L * nS
          val dataStart = ifdOff + ifdSize + shortOol + tileOol
          val segOffsets = segPadded.scanLeft(dataStart)(_ + _)
          val endPos = segOffsets.last
          require(big || endPos < (1L << 32),
            "image exceeds classic TIFF 4 GiB limit — write with " +
              "TiffOptions(bigTiff = true) or use the parquet plane store")
          val nextIfd = if (planeIdx == totalPlanes - 1) 0L else endPos

          // little-endian shorts packed into the inline value slot
          def packedShorts(v: Long): Long =
            (0 until nS).map(i => (v & 0xffffL) << (16 * i)).reduce(_ | _)
          val baseEntries = Seq(
            TiffFormat.Entry(TiffFormat.TagImageWidth, TiffFormat.TypeLong, 1, s.w),
            TiffFormat.Entry(TiffFormat.TagImageLength, TiffFormat.TypeLong, 1, s.h),
            TiffFormat.Entry(TiffFormat.TagBitsPerSample, TiffFormat.TypeShort, nS,
              if (nS == 1) bps * 8L
              else if (big) packedShorts(bps * 8L)
              else bitsArrOff),
            TiffFormat.Entry(TiffFormat.TagCompression, TiffFormat.TypeShort, 1, opts.compression),
            TiffFormat.Entry(TiffFormat.TagPhotometric, TiffFormat.TypeShort, 1,
              if (nS == 3) 2 else 1), // RGB vs BlackIsZero
            TiffFormat.Entry(TiffFormat.TagSamplesPerPixel, TiffFormat.TypeShort, 1, nS),
            TiffFormat.Entry(TiffFormat.TagSampleFormat, TiffFormat.TypeShort, nS,
              if (nS == 1) TiffFormat.sampleFormat(s.pt)
              else if (big) packedShorts(TiffFormat.sampleFormat(s.pt))
              else sfArrOff)) ++
            (if (planeIdx == 0)
              Seq(TiffFormat.Entry(TiffFormat.TagImageDescription,
                TiffFormat.TypeAscii, xmlBytes.length, xmlOffset))
            else Seq.empty)

          val offArrOff = ifdOff + ifdSize + shortOol
          val cntArrOff = offArrOff + offSize.toLong * n
          val layoutEntries = opts.tile match {
            case None => Seq(
              TiffFormat.Entry(TiffFormat.TagStripOffsets, offType, n,
                if (n == 1) segOffsets(0) else offArrOff),
              TiffFormat.Entry(TiffFormat.TagRowsPerStrip, TiffFormat.TypeLong, 1, rps),
              TiffFormat.Entry(TiffFormat.TagStripByteCounts, offType, n,
                if (n == 1) segments(0).length else cntArrOff))
            case Some((tw, tl)) =>
              Seq(
                TiffFormat.Entry(TiffFormat.TagTileWidth, TiffFormat.TypeLong, 1, tw),
                TiffFormat.Entry(TiffFormat.TagTileLength, TiffFormat.TypeLong, 1, tl),
                TiffFormat.Entry(TiffFormat.TagTileOffsets, offType, n,
                  if (n == 1) segOffsets(0) else offArrOff),
                TiffFormat.Entry(TiffFormat.TagTileByteCounts, offType, n,
                  if (n == 1) segments(0).length else cntArrOff))
          }
          write(TiffFormat.ifdBytes(baseEntries ++ layoutEntries, nextIfd, big))
          if (shortOol > 0) {
            val b = ByteBuffer.allocate(shortOol).order(ByteOrder.LITTLE_ENDIAN)
            (0 until nS).foreach(_ => b.putShort((bps * 8).toShort))
            (0 until nS).foreach(_ =>
              b.putShort(TiffFormat.sampleFormat(s.pt).toShort))
            write(b.array())
          }
          if (tileOol > 0) {
            val b = ByteBuffer.allocate(tileOol).order(ByteOrder.LITTLE_ENDIAN)
            if (big) {
              segOffsets.init.foreach(b.putLong)
              segments.foreach(sg => b.putLong(sg.length.toLong))
            } else {
              segOffsets.init.foreach(o => b.putInt(o.toInt))
              segments.foreach(sg => b.putInt(sg.length))
            }
            write(b.array())
          }
          segments.foreach { sg =>
            write(sg)
            if ((sg.length & 1) == 1) write(Array[Byte](0)) // word alignment
          }
          seen += 1
          planeIdx += 1
        }
        require(seen == planeCounts(i),
          s"scene ${sel(i)}: expected ${planeCounts(i)} planes, saw $seen")
      }
        img.setScene(saved)
      } finally out.close()
      // promote: replace any existing destination only after a full write
      if (fs.exists(dest)) fs.delete(dest, false)
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(s"failed to rename $tmp to $uri")
    } catch {
      case e: Throwable =>
        try fs.delete(tmp, false) catch { case _: Throwable => () }
        throw e
    }
  }
}
