package graft.writers

import java.awt.image.BufferedImage

import javax.imageio.ImageIO

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.formats.TarFormat
import graft.image.{BioImage, Sel}

/** WebDataset-style `.tar` training-shard sink: every selected scene
  * becomes one SAMPLE — a PNG member plus a `.txt` sidecar member
  * sharing the basename key (the WebDataset grouping convention
  * [[graft.readers.TarReader]] reads back). Keys are zero-padded scene
  * ordinals so members stream in deterministic sample order — the
  * property shard-sequential training loaders rely on. PNG members
  * (lossless, 8/16-bit) carry YX gray or YXS(3) RGB planes; richer
  * dimensionality belongs in zarr/plane-store, same contract as the 2D
  * writers. */
object TarWriter extends BioWriter {
  override def name: String = "TarWriter"
  override def supportedExtensions: Seq[String] = Seq(".tar")

  override def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]]): Unit = {
    val sel = Writers.validateSelection(img, selectScenes)
    val saved = img.currentSceneIndex
    val members = Seq.newBuilder[TarFormat.Member]
    try {
      sel.zipWithIndex.foreach { case (sceneId, i) =>
        img.setScene(sceneId)
        val key = f"$i%06d"
        members += TarFormat.Member(s"$key.png", encodePng(img))
        members += TarFormat.Member(s"$key.txt",
          sceneId.getBytes("UTF-8"))
      }
    } finally img.setScene(saved)
    val fs = FileSystem.get(new Path(uri).toUri,
      img.spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(uri), true)
    try out.write(TarFormat.build(members.result()))
    finally out.close()
  }

  private def encodePng(img: BioImage): Array[Byte] = {
    val d = img.dims
    val h = d('Y').toInt
    val w = d('X').toInt
    val nS = if (d.order.contains('S')) d('S').toInt else 1
    require(nS == 1 || nS == 3,
      s"tar shard PNG members support 1 (gray) or 3 (RGB) samples, " +
        s"got S=$nS")
    val sixteen = img.meta.pixelType == graft.core.PixelType.UInt16
    val reduce = d.order.filter(c => c != 'Y' && c != 'X' && c != 'S')
      .map(c => c -> (Sel.Index(0): Sel)).toMap
    val buf = new BufferedImage(w, h,
      if (nS == 3) BufferedImage.TYPE_INT_RGB
      else if (sixteen) BufferedImage.TYPE_USHORT_GRAY
      else BufferedImage.TYPE_BYTE_GRAY)
    val raster = buf.getRaster
    val maxV = if (sixteen) 65535 else 255
    val nd =
      if (nS == 3) img.getImageData("YXS", reduce)
      else img.getImageData("YX", reduce)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var s = 0
        while (s < nS) {
          val raw = if (nS == 3) nd.array(y, x, s) else nd.array(y, x)
          raster.setSample(x, y, s,
            math.min(maxV, math.max(0, raw.round.toInt)))
          s += 1
        }
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (!ImageIO.write(buf, "png", bos))
      throw new IllegalStateException("no png encoder available")
    bos.toByteArray
  }
}
