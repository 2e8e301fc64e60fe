package graft.writers

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions.{array, array_sort, col, collect_list, struct, transform}
import org.apache.spark.util.SerializableConfiguration

import graft.core.Plane
import graft.formats.ZarrFormat
import graft.image.BioImage

/** OME-ZARR (NGFF 0.4) sink. Unlike the single-file OME-TIFF, zarr chunks
  * are independent objects — so the pixel write is FULLY DISTRIBUTED:
  * executors write their chunk files straight to the target FileSystem
  * via foreachPartition (no driver funnel, no collect), and only the
  * small JSON metadata documents are written driver-side. This is the
  * scale-path image sink. `levels` > 1 materializes the NGFF multiscale
  * pyramid via the shared 2× mean-pool.
  */
object ZarrWriter extends BioWriter {
  override def name: String = "ZarrWriter"
  override def supportedExtensions: Seq[String] = Seq(".ome.zarr", ".zarr")

  override def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]]): Unit =
    save(img, uri, selectScenes, levels = 1)

  def save(img: BioImage, uri: String, selectScenes: Option[Seq[String]],
      levels: Int): Unit =
    save(img, uri, selectScenes, levels, compressor = None)

  /** `compressor`: None (raw chunks), "zlib", or "blosc" (lz4 +
    * byte-shuffle — the bioformats2raw-default chunk wrapping). */
  def save(img: BioImage, uri: String, selectScenes: Option[Seq[String]],
      levels: Int, compressor: Option[String]): Unit = {
    val spark = img.spark
    val sel = Writers.validateSelection(img, selectScenes)
    require(levels >= 1, s"levels must be >= 1, got $levels")

    val saved = img.currentSceneIndex
    val hconf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs = FileSystem.get(new Path(uri).toUri, hconf.value)

    def writeDoc(path: String, content: String): Unit = {
      val out = fs.create(new Path(path), true)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }

    writeDoc(s"$uri/.zgroup", ZarrFormat.zgroup)
    writeDoc(s"$uri/.zattrs", ZarrFormat.rootAttrs(sel.length))

    sel.zipWithIndex.foreach { case (sid, g) =>
      img.setScene(sid)
      val m = img.meta
      val d = img.dims // stitched for mosaic scenes
      val nS = if (d.order.contains('S')) d('S').toInt else 1
      val (t, c, z, h, w) =
        (d('T'), d('C'), d('Z'), d('Y'), d('X'))
      val pt = m.pixelType
      val dtype = ZarrFormat.dtypeOf(pt)

      // group metadata (driver-side, tiny)
      val scale0 = Seq(m.timeInterval.getOrElse(1.0), 1.0,
        m.physicalPixelSizes.map(_._1).getOrElse(1.0),
        m.physicalPixelSizes.map(_._2).getOrElse(1.0),
        m.physicalPixelSizes.map(_._3).getOrElse(1.0))
      writeDoc(s"$uri/$g/.zgroup", ZarrFormat.zgroup)
      // scene ids are REGENERATED with order preserved, the shared writer
      // contract (bio_image.py:1252-1257) — same as OME-TIFF / .graft
      writeDoc(s"$uri/$g/.zattrs",
        ZarrFormat.imageAttrs(s"Image:$g", levels, scale0, img.channelNames,
          sSamples = nS))
      val hs = Iterator.iterate(h)(v => (v + 1) / 2).take(levels).toSeq
      val ws = Iterator.iterate(w)(v => (v + 1) / 2).take(levels).toSeq
      val sTail = if (nS > 1) Seq(nS.toLong) else Seq.empty
      (0 until levels).foreach { l =>
        writeDoc(s"$uri/$g/$l/.zarray", ZarrFormat.zarray(
          Seq(t, c, z, hs(l), ws(l)) ++ sTail,
          Seq(1L, 1L, 1L, hs(l), ws(l)) ++ sTail, dtype,
          compressor))
      }

      // chunk files: distributed — each task writes its chunks directly.
      // S>1: the chunk holds the interleaved YXS block, so the nS sample
      // rows of a plane group into one write (a tiny keyed shuffle).
      val levelDfs = Iterator.iterate(img.stitchedPlanes)(Plane.poolHalf)
        .take(levels).toSeq
      val target = s"$uri/$g"
      val sSuffix = if (nS > 1) ".0" else ""
      levelDfs.foreach { df =>
        val chunks =
          if (nS == 1)
            df.select(col("level"), col("t"), col("c"), col("z"),
              array(col("pixels")).as("bands"))
          else
            df.select(col("level"), col("t"), col("c"), col("z"), col("s"),
              col("pixels"))
              .groupBy(col("level"), col("t"), col("c"), col("z"))
              .agg(transform(
                array_sort(collect_list(struct(col("s"), col("pixels")))),
                b => b.getField("pixels")).as("bands"))
        chunks.foreachPartition {
          (rows: Iterator[org.apache.spark.sql.Row]) =>
            if (rows.nonEmpty) {
              val pfs = FileSystem.get(
                new java.net.URI(target + "/"), hconf.value)
              val typesize = ZarrFormat.bytesPer(ZarrFormat.dtypeOf(pt))
              rows.foreach { r =>
                val key =
                  s"$target/${r.getInt(0)}/${r.getInt(1)}.${r.getInt(2)}.${r.getInt(3)}.0.0$sSuffix"
                val bands = r.getSeq[scala.collection.Seq[Double]](4)
                val px =
                  if (bands.length == 1) bands.head.toArray
                  else {
                    val out = new Array[Double](bands.head.length * bands.length)
                    var si = 0
                    while (si < bands.length) {
                      val b = bands(si)
                      var k = 0
                      while (k < b.length) {
                        out(k * bands.length + si) = b(k)
                        k += 1
                      }
                      si += 1
                    }
                    out
                  }
                val out = pfs.create(new Path(key), true)
                try out.write(ZarrFormat.compressChunk(
                  ZarrFormat.encodeChunk(px, pt), compressor, typesize))
                finally out.close()
              }
            }
        }
      }
    }
    img.setScene(saved)
  }
}
