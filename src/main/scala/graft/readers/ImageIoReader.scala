package graft.readers

import javax.imageio.ImageIO

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Dimensions, PixelType, PlaneRow, UnsupportedFileFormatError}
import graft.plugins.{BioReader, PluginEntry, SceneMeta}

/** PNG / JPEG / GIF / BMP source via `javax.imageio` — the analog of the
  * reference's imageio-formats plugin family
  * (/root/reference/README.md:55-70). One file = one scene; grayscale
  * decodes as YX, multi-band images as YXS (trailing Samples), matching
  * the reference's 2D(+S) behavior for these formats.
  *
  * These are small interchange images: the file decodes driver-side
  * (ImageIO has no streaming tile API) into per-(sample) plane rows; the
  * resulting DataFrame is distributed like any other plane table. Bulk
  * pixel data at scale belongs in the Parquet plane store.
  */
final class ImageIoReader(spark: SparkSession, path: String) extends BioReader {

  private lazy val image: java.awt.image.BufferedImage = {
    val fs = FileSystem.get(new Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(path))
    try {
      val img = ImageIO.read(in)
      if (img == null)
        throw new UnsupportedFileFormatError(
          s"javax.imageio cannot decode '$path'")
      img
    } finally in.close()
  }

  override def name: String = "ImageIoReader"
  override def supportedExtensions: Seq[String] =
    Seq(".png", ".jpg", ".jpeg", ".gif", ".bmp")

  override def isSupportedImage(spark: SparkSession, p: String): Boolean =
    try {
      val fs = FileSystem.get(new Path(p).toUri,
        spark.sparkContext.hadoopConfiguration)
      val in = fs.open(new Path(p))
      try {
        val magic = new Array[Byte](4)
        in.readFully(0, magic)
        val png = magic(0) == 0x89.toByte && magic(1) == 'P'
        val jpg = magic(0) == 0xff.toByte && magic(1) == 0xd8.toByte
        val gif = magic(0) == 'G' && magic(1) == 'I' && magic(2) == 'F'
        val bmp = magic(0) == 'B' && magic(1) == 'M'
        png || jpg || gif || bmp
      } finally in.close()
    } catch { case _: Throwable => false }

  private def bands: Int = image.getRaster.getNumBands

  override def scenes: Seq[String] = Seq("Image:0")

  override def sceneMeta(sceneIdx: Int): SceneMeta = {
    require(sceneIdx == 0, s"single-scene source, got scene $sceneIdx")
    val h = image.getHeight.toLong
    val w = image.getWidth.toLong
    val pt =
      if (image.getColorModel.getComponentSize(0) > 8) PixelType.UInt16
      else PixelType.UInt8
    val dims =
      if (bands == 1) Dimensions("TCZYX", Seq(1L, 1L, 1L, h, w))
      else Dimensions("TCZYXS", Seq(1L, 1L, 1L, h, w, bands.toLong))
    SceneMeta(0, "Image:0", dims, channelNames = Seq.empty,
      physicalPixelSizes = None, pixelType = pt,
      tilePositions = Seq.empty, rawMetadata = None)
  }

  override def readDelayed(spark: SparkSession, sceneIdx: Int): DataFrame = {
    require(sceneIdx == 0, s"single-scene source, got scene $sceneIdx")
    val raster = image.getRaster
    val h = image.getHeight
    val w = image.getWidth
    val rows = (0 until bands).map { s =>
      val px = new Array[Double](h * w)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) = raster.getSampleDouble(x, y, s)
          x += 1
        }
        y += 1
      }
      PlaneRow(0, "Image:0", level = 0, m = 0, t = 0, c = 0, z = 0, s = s,
        y0 = 0, x0 = 0, h = h, w = w, pixels = px)
    }
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }
}

object ImageIoReader {
  val plugin: PluginEntry = PluginEntry(
    name = "ImageIoReader",
    extensions = Seq(".png", ".jpg", ".jpeg", ".gif", ".bmp"),
    open = (spark, path, _) => new ImageIoReader(spark, path))
}
