package graft.writers

import java.awt.image.{BufferedImage, IndexColorModel}

import javax.imageio.metadata.IIOMetadataNode
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.image.{BioImage, Sel}

/** T-axis movie sink — the analog of the reference registry's
  * TimeSeriesWriter (/root/reference/README.md:78-85, .gif/.mp4/.mkv via
  * its imageio plugin). Here the target is animated GIF: the one
  * container with a JDK-native encoder (mp4/mkv need external codecs,
  * out of reach for a zero-dependency build). The CURRENT scene's T
  * frames (C=0, Z=0) write in order with per-frame delay taken from the
  * scene's time_interval metadata and infinite looping.
  *
  * Grayscale frames write through an explicit 256-gray palette, so
  * values ≤ 8-bit roundtrip EXACTLY (GIF stores palette indices; index i
  * maps to gray i). RGB (S=3) frames are palette-quantized by the
  * encoder — inherently lossy, like JPEG; the read-back contract is
  * decode-equality with the JDK's own GIF path, not source-equality.
  *
  * Like PNG, GIF is a small interchange format: frames assemble
  * driver-side (ImageIO has no distributed encoder); bulk time-series
  * data at scale belongs in the Parquet plane store.
  */
object TimeSeriesWriter extends BioWriter {
  override def name: String = "TimeSeriesWriter"
  override def supportedExtensions: Seq[String] = Seq(".gif")

  /** 8-bit identity gray palette: index i = color (i,i,i). */
  private val grayPalette: IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  override def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]]): Unit = {
    val saved = img.currentSceneIndex
    try saveCurrent(img, uri, selectScenes)
    finally img.setScene(saved)
  }

  private def saveCurrent(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]]): Unit = {
    selectScenes.foreach { sel =>
      require(sel.length == 1 && img.scenes.contains(sel.head),
        s"GIF holds exactly one scene's T series; got selection $sel")
      img.setScene(sel.head)
    }
    val d = img.dims
    val nT = d('T').toInt
    val h = d('Y').toInt
    val w = d('X').toInt
    val nS = if (d.order.contains('S')) d('S').toInt else 1
    require(nS == 1 || nS == 3,
      s"GIF supports 1 (gray) or 3 (RGB) samples, got S=$nS")
    // one driver-side collect of the whole T series (C/Z pinned at 0)
    val reduce = d.order.filter(c => !"TYXS".contains(c))
      .map(c => c -> (Sel.Index(0): Sel)).toMap
    val nd =
      if (nS == 3) img.getImageData("TYXS", reduce)
      else img.getImageData("TYX", reduce)

    // per-frame delay in centiseconds (GIF's unit) from time_interval
    val delayCs = img.meta.timeInterval
      .map(s => math.max(1, math.round(s * 100).toInt)).getOrElse(10)

    val writer = {
      val it = ImageIO.getImageWritersByFormatName("gif")
      require(it.hasNext, "no GIF encoder available")
      it.next()
    }
    val fs = FileSystem.get(new Path(uri).toUri,
      img.spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(uri), true)
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var t = 0
      while (t < nT) {
        val frame =
          if (nS == 3) {
            val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            val r = bi.getRaster
            for (y <- 0 until h; x <- 0 until w; s <- 0 until 3)
              r.setSample(x, y, s,
                math.min(255, math.max(0, nd.array(t, y, x, s).round.toInt)))
            bi
          } else {
            val bi = new BufferedImage(w, h,
              BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
            val r = bi.getRaster
            for (y <- 0 until h; x <- 0 until w)
              r.setSample(x, y, 0,
                math.min(255, math.max(0, nd.array(t, y, x).round.toInt)))
            bi
          }
        val meta = writer.getDefaultImageMetadata(
          new ImageTypeSpecifier(frame), writer.getDefaultWriteParam)
        val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
        val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        val gce = childNode(root, "GraphicControlExtension")
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", delayCs.toString)
        if (t == 0) {
          // NETSCAPE2.0 loop-forever extension on the first frame
          val apps = childNode(root, "ApplicationExtensions")
          val app = new IIOMetadataNode("ApplicationExtension")
          app.setAttribute("applicationID", "NETSCAPE")
          app.setAttribute("authenticationCode", "2.0")
          app.setUserObject(Array[Byte](1, 0, 0))
          apps.appendChild(app)
        }
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new IIOImage(frame, null, meta), null)
        t += 1
      }
      writer.endWriteSequence()
    } finally {
      try ios.close() finally out.close()
      writer.dispose()
    }
  }

  /** Existing child element of `root` by name, appending if absent. */
  private def childNode(root: IIOMetadataNode,
      name: String): IIOMetadataNode = {
    var i = 0
    while (i < root.getLength) {
      val n = root.item(i)
      if (n.getNodeName == name) return n.asInstanceOf[IIOMetadataNode]
      i += 1
    }
    val n = new IIOMetadataNode(name)
    root.appendChild(n)
    n
  }
}
