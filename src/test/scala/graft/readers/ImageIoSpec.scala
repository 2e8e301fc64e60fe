package graft.readers

import java.awt.image.BufferedImage
import java.nio.file.Files

import javax.imageio.ImageIO

import graft.{BioSpark, SparkSpec}
import graft.core.NDArray
import graft.writers.PngWriter

class ImageIoSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-img").toString + "/" + name

  test("grayscale PNG roundtrip via writer registry + plugin resolution") {
    val arr = NDArray.tabulate(Seq(4, 5))(idx => idx(0) * 10.0 + idx(1))
    val img = BioSpark.fromArray(spark, arr)
    val uri = tmp("gray.png")
    img.save(uri) // Writers dispatch → PngWriter
    val back = BioSpark.open(spark, uri)
    assert(back.reader.name == "ImageIoReader")
    assert(back.dims.order == "TCZYX")
    assert(back.dims.shape == Seq(1, 1, 1, 4, 5))
    val nd = back.getImageData("YX")
    assert(nd.array(3, 4) == 34.0)
    assert(nd.array(0, 0) == 0.0)
  }

  test("RGB PNG reads as YXS with per-band values") {
    val buf = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3) {
      val r = y * 10 + x; val g = 100 + r; val b = 200 + r
      buf.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val p = tmp("rgb.png")
    ImageIO.write(buf, "png", new java.io.File(p))
    val back = BioSpark.open(spark, p)
    assert(back.dims.order == "TCZYXS")
    assert(back.dims.shape == Seq(1, 1, 1, 2, 3, 3))
    val nd = back.getImageData("YXS")
    assert(nd.array(1, 2, 0) == 12.0) // R band
    assert(nd.array(1, 2, 1) == 112.0) // G
    assert(nd.array(1, 2, 2) == 212.0) // B
  }

  test("PNG writer clamps out-of-range values") {
    val arr = NDArray.tabulate(Seq(1, 3))(idx => idx(1) * 300.0 - 100)
    val uri = tmp("clamp.png")
    PngWriter.save(BioSpark.fromArray(spark, arr), uri, None)
    val back = BioSpark.open(spark, uri)
    val nd = back.getImageData("YX")
    assert(nd.array(0, 0) == 0.0) // -100 clamped
    assert(nd.array(0, 1) == 200.0)
    assert(nd.array(0, 2) == 255.0) // 500 clamped
  }

  test("non-image file is rejected by plugin resolution") {
    val p = tmp("not.png")
    Files.write(java.nio.file.Paths.get(p), "hello".getBytes)
    intercept[graft.core.UnsupportedFileFormatError](BioSpark.open(spark, p))
  }
}
