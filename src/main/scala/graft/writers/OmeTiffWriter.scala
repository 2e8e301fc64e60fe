package graft.writers

import java.io.BufferedOutputStream
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions.col

import graft.core.PixelType
import graft.formats.TiffFormat
import graft.image.BioImage
import graft.meta.{OME, OmeChannel, OmeImage, OmePixels, OmeXml}

/** OME-TIFF sink — the reference's canonical `BioImage.save` target
  * (/root/reference/bioio/bio_image.py:1229-1301): selected scenes are
  * renumbered ("Image:{i}"), order preserved, per-scene channel names and
  * physical pixel sizes carried into the OME-XML, which lives in the first
  * IFD's ImageDescription.
  *
  * Layout is computed up-front from the scene catalog (plane count × h ×
  * w × dtype), so the file streams in one sequential pass — no seeks, so
  * any Hadoop FileSystem target works (file:, hdfs:, s3a:). Plane data is
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
      selectScenes: Option[Seq[String]]): Unit = {
    val sel = Writers.validateSelection(img, selectScenes)

    val saved = img.currentSceneIndex
    // per-scene layout facts from the catalog (no data scan)
    case class SceneLayout(origIdx: Int, t: Int, c: Int, z: Int, h: Int,
        w: Int, pt: PixelType.Value, channelNames: Seq[String],
        pps: Option[(Double, Double, Double)], timeInterval: Option[Double])
    val layouts = sel.zipWithIndex.map { case (sid, renum) =>
      img.setScene(sid)
      val m = img.meta
      val d = img.dims
      if (d.order.contains('S') && d('S') > 1)
        throw new UnsupportedOperationException(
          "multi-sample (S>1) scenes are not supported by this writer yet")
      SceneLayout(img.currentSceneIndex, d('T').toInt, d('C').toInt,
        d('Z').toInt, d('Y').toInt, d('X').toInt, m.pixelType,
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

    // deterministic offsets: header | xml | strips | IFD chain
    val headerSize = 8L
    val xmlOffset = headerSize
    val stripStart = xmlOffset + xmlPadded
    val planeBytes = layouts.map(s =>
      s.h.toLong * s.w * TiffFormat.bytesPerSample(s.pt))
    // TIFF 6.0 requires word-aligned offsets: odd-sized strips are padded
    // with one byte (StripByteCounts stays the true size)
    val paddedBytes = planeBytes.map(b => b + (b & 1))
    val planeCounts = layouts.map(s => s.t * s.c * s.z)
    val sceneStripStart = planeCounts.zip(paddedBytes)
      .scanLeft(stripStart) { case (acc, (n, b)) => acc + n * b }
    val ifdStart = sceneStripStart.last
    val totalPlanes = planeCounts.sum
    require(ifdStart + totalPlanes.toLong * TiffFormat.ifdSize(11) < (1L << 32),
      "image exceeds classic TIFF 4 GiB limit — use the parquet plane store")

    val fs = FileSystem.get(new Path(uri).toUri,
      img.spark.sparkContext.hadoopConfiguration)
    val out = new BufferedOutputStream(fs.create(new Path(uri), true), 1 << 20)
    try {
      // IFD offsets: first IFD right at ifdStart; sized per entry count
      val ifdSizes = (0 until totalPlanes).map(p =>
        TiffFormat.ifdSize(if (p == 0) 11 else 10))
      val ifdOffsets = ifdSizes.scanLeft(ifdStart)(_ + _)

      out.write(TiffFormat.headerBytes(ifdOffsets.head))
      out.write(xmlBytes)
      if (xmlPadded > xmlBytes.length) out.write(0)

      // strips: scene by scene, planes in (t,c,z) order, z fastest (XYZCT)
      layouts.zipWithIndex.foreach { case (s, i) =>
        img.setScene(s.origIdx)
        val it = img.stitchedPlanes
          .select(col("t"), col("c"), col("z"), col("pixels"))
          .orderBy(col("t"), col("c"), col("z"))
          .toLocalIterator()
        var seen = 0
        while (it.hasNext) {
          val row = it.next()
          val strip = TiffFormat.encodePlane(
            row.getSeq[Double](3).toArray, s.pt)
          out.write(strip)
          if ((strip.length & 1) == 1) out.write(0) // word alignment
          seen += 1
        }
        require(seen == planeCounts(i),
          s"scene ${sel(i)}: expected ${planeCounts(i)} planes, saw $seen")
      }
      img.setScene(saved)

      // IFD chain
      var p = 0
      layouts.zipWithIndex.foreach { case (s, i) =>
        val bytesPer = paddedBytes(i)
        (0 until planeCounts(i)).foreach { k =>
          val stripOffset = sceneStripStart(i) + k * bytesPer
          val desc =
            if (p == 0) Some((xmlOffset, xmlBytes.length.toLong)) else None
          val next =
            if (p == totalPlanes - 1) 0L else ifdOffsets(p + 1)
          out.write(TiffFormat.ifdBytes(
            TiffFormat.planeEntries(s.w, s.h, s.pt, stripOffset, desc), next))
          p += 1
        }
      }
    } finally out.close()
  }
}
