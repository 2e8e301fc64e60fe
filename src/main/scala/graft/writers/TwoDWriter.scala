package graft.writers

import java.awt.image.BufferedImage

import javax.imageio.ImageIO

import org.apache.hadoop.fs.{FileSystem, Path}
import graft.image.{BioImage, Sel}

/** 2D image sink — the analog of the reference registry's TwoDWriter
  * (/root/reference/README.md:78-85: `.png, .bmp, .jpg, ...`): the
  * CURRENT scene's (T=0, C=0, Z=0) plane through the JDK's ImageIO
  * encoders, format picked by extension.
  *
  * Fidelity contract per format:
  *  - PNG: lossless; 8- or 16-bit grayscale, 8- or 16-bit/channel RGB.
  *  - BMP: lossless; 8-bit grayscale or RGB (BMP has no 16-bit form in
  *    the JDK encoder — UInt16 sources are rejected, never truncated
  *    silently).
  *  - JPEG: 8-bit grayscale or RGB, DCT-lossy — the read-back contract
  *    is decode-equality with the JDK's own JPEG path (the bar the GIF
  *    time-series sink established, TimeSeriesWriter.scala:21-24), not
  *    source-equality.
  *
  * Like the reference's 2D writer these are small interchange formats:
  * the plane assembles driver-side (ImageIO has no distributed encoder);
  * bulk pixel data at scale belongs in the zarr / parquet plane sinks.
  */
object TwoDWriter extends BioWriter {
  override def name: String = "TwoDWriter"
  override def supportedExtensions: Seq[String] =
    Seq(".png", ".bmp", ".jpg", ".jpeg")

  /** ImageIO format name for a target uri — direct callers can hand any
    * path here, so an extension outside the registered set raises rather
    * than silently writing JPEG bytes under a foreign name. */
  private def formatOf(uri: String): String = {
    val lower = uri.toLowerCase.takeWhile(_ != '?')
    if (lower.endsWith(".png")) "png"
    else if (lower.endsWith(".bmp")) "bmp"
    else if (lower.endsWith(".jpg") || lower.endsWith(".jpeg")) "jpg"
    else throw new IllegalArgumentException(
      s"$name cannot infer a format for '$uri' " +
        s"(supported: ${supportedExtensions.mkString(", ")})")
  }

  override def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]]): Unit =
    save(img, uri, selectScenes, Map.empty[String, String])

  /** Facade options: "quality" — JPEG encode quality in (0,1]
    * (ImageIO's compression-quality parameter; default leaves the
    * encoder's own default, ~0.75). Rejected for png/bmp (lossless). */
  override def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]],
      options: Map[String, String]): Unit = {
    WriterOptions.unknown(options, Set("quality"), name)
    val quality = options.get("quality").map { v =>
      val q = try v.trim.toFloat catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"writer option quality must be a number in (0,1], got '$v'")
      }
      require(q > 0f && q <= 1f,
        s"writer option quality must be in (0,1], got $q")
      q
    }
    require(quality.isEmpty || formatOf(uri) == "jpg",
      "writer option quality applies to JPEG only")
    val saved = img.currentSceneIndex
    try saveCurrent(img, uri, selectScenes, quality)
    finally img.setScene(saved)
  }

  private def saveCurrent(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]], quality: Option[Float]): Unit = {
    val fmt = formatOf(uri)
    selectScenes.foreach { sel =>
      require(sel.length == 1 && img.scenes.contains(sel.head),
        s"${fmt.toUpperCase} holds exactly one 2D plane; got selection $sel")
      img.setScene(sel.head)
    }
    val d = img.dims
    val h = d('Y').toInt
    val w = d('X').toInt
    val nS = if (d.order.contains('S')) d('S').toInt else 1
    require(nS == 1 || nS == 3,
      s"${fmt.toUpperCase} supports 1 (gray) or 3 (RGB) samples, got S=$nS")
    val sixteen = img.meta.pixelType == graft.core.PixelType.UInt16
    require(!sixteen || fmt == "png",
      s"${fmt.toUpperCase} has no 16-bit encoding; save UInt16 data as " +
        ".png (or a zarr/tiff/plane store)")
    val reduce = d.order.filter(c => c != 'Y' && c != 'X' && c != 'S')
      .map(c => c -> (Sel.Index(0): Sel)).toMap
    val buf =
      if (nS == 3 && sixteen) {
        // 16-bit RGB has no standard BufferedImage TYPE_*: build an
        // interleaved ushort component image (PNG supports 16-bit/channel)
        import java.awt.image.{ComponentColorModel, DataBuffer, Raster}
        import java.awt.color.ColorSpace
        val cm = new ComponentColorModel(
          ColorSpace.getInstance(ColorSpace.CS_sRGB),
          Array(16, 16, 16), false, false, java.awt.Transparency.OPAQUE,
          DataBuffer.TYPE_USHORT)
        val r = Raster.createInterleavedRaster(
          DataBuffer.TYPE_USHORT, w, h, 3, null)
        new BufferedImage(cm, r, false, null)
      } else new BufferedImage(w, h,
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
          val v = math.min(maxV, math.max(0, raw.round.toInt))
          raster.setSample(x, y, s, v)
          s += 1
        }
        x += 1
      }
      y += 1
    }
    val fs = FileSystem.get(new Path(uri).toUri,
      img.spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(uri), true)
    try {
      quality match {
        case Some(q) =>
          // explicit JPEG quality: drive the encoder through its
          // ImageWriteParam instead of the convenience ImageIO.write
          val it = ImageIO.getImageWritersByFormatName(fmt)
          if (!it.hasNext)
            throw new IllegalStateException(s"no $fmt encoder available")
          val writer = it.next()
          val ios = ImageIO.createImageOutputStream(out)
          try {
            val param = writer.getDefaultWriteParam
            param.setCompressionMode(
              javax.imageio.ImageWriteParam.MODE_EXPLICIT)
            param.setCompressionQuality(q)
            writer.setOutput(ios)
            writer.write(null, new javax.imageio.IIOImage(buf, null, null),
              param)
          } finally {
            // close (not just flush): the default FileCacheImageOutput-
            // Stream frees its disk-cache temp file only on close
            ios.close(); writer.dispose()
          }
        case None =>
          if (!ImageIO.write(buf, fmt, out))
            throw new IllegalStateException(s"no $fmt encoder available")
      }
    } finally out.close()
  }
}
