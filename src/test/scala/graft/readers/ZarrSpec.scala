package graft.readers

import java.nio.file.Files

import graft.{BioSpark, SparkSpec}
import graft.core.NDArray
import graft.image.BioImage
import graft.writers.ZarrWriter

class ZarrSpec extends SparkSpec {

  private def formulaic(shape: Seq[Int]): NDArray =
    NDArray.tabulate(shape)(idx =>
      idx.zipWithIndex.map { case (v, i) =>
        v * math.pow(10, shape.length - 1 - i)
      }.sum)

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-zarr").toString + "/" + name

  test("write → plugin-resolve → read roundtrip, distributed chunks") {
    val img = BioSpark.fromArray(spark, formulaic(Seq(2, 3, 4, 5))) // CZYX
    val uri = tmp("img.ome.zarr")
    img.save(uri)
    val back = BioSpark.open(spark, uri)
    assert(back.reader.name == "ZarrReader")
    assert(back.dims.order == "TCZYX")
    assert(back.dims.shape == Seq(1, 2, 3, 4, 5))
    val nd = back.getImageData("CZYX")
    assert(nd.array(1, 2, 3, 4) == 1234.0)
    assert(nd.array(0, 1, 0, 2) == 102.0)
  }

  test("multi-scene bioformats2raw layout with channel names and pps") {
    val arrs = Seq(NDArray.zeros(Seq(2, 2, 2)), NDArray.zeros(Seq(3, 3)))
    val reader = new ArrayLikeReader(arrs,
      Seq(Some("CYX"), Some("YX")),
      Seq(Some(Seq("DAPI", "GFP")), None),
      physicalPixelSizes = Some((2.0, 0.5, 0.5)))
    val img = new BioImage(spark, reader)
    val uri = tmp("multi.ome.zarr")
    img.save(uri)
    val back = BioSpark.open(spark, uri)
    assert(back.scenes == Seq("Image:0", "Image:1"))
    assert(back.channelNames == Seq("DAPI", "GFP"))
    assert(back.physicalPixelSizes.contains((2.0, 0.5, 0.5)))
    back.setScene("Image:1")
    assert(back.dims.shape == Seq(1, 1, 1, 3, 3))
    assert(back.rawMetadata.exists(_.contains("multiscales")))
  }

  test("NGFF multiscale pyramid: levels readable with per-level dims") {
    val arr = NDArray.tabulate(Seq(8, 8))(idx => idx(0) * 10.0 + idx(1))
    val img = BioSpark.fromArray(spark, arr)
    val uri = tmp("pyr.ome.zarr")
    ZarrWriter.save(img, uri, None, levels = 2)
    val back = BioSpark.open(spark, uri)
    assert(back.resolutionLevels == Seq(0, 1))
    back.setResolutionLevel(1)
    assert(back.dims.shape == Seq(1, 1, 1, 4, 4))
    val nd = back.getImageData("YX")
    assert(nd.array(0, 0) == 5.5) // mean of {0,1,10,11}
  }

  test("multi-plane TCZ chunk grid roundtrips") {
    val img = BioSpark.fromArray(spark, formulaic(Seq(2, 3, 2, 2, 2))) // TCZYX
    val uri = tmp("tcz.zarr")
    img.save(uri)
    val back = BioSpark.open(spark, uri)
    assert(back.dims.shape == Seq(2, 3, 2, 2, 2))
    val nd = back.getImageData("TCZYX")
    assert(nd.array(1, 2, 1, 0, 1) == 12101.0)
  }

  test("tiled chunks (2x2 grid) surface as mosaic tiles and stitch back") {
    import java.nio.file.Paths
    import graft.core.PixelType
    import graft.formats.ZarrFormat
    // hand-built NGFF store: 4x4 plane stored as four 2x2 chunks
    val root = tmp("tiled.zarr")
    Files.createDirectories(Paths.get(root, "0"))
    def put(rel: String, bytes: Array[Byte]): Unit =
      Files.write(Paths.get(root, rel), bytes)
    put(".zgroup", ZarrFormat.zgroup.getBytes)
    put(".zattrs", ZarrFormat.imageAttrs("Image:0", 1,
      Seq(1, 1, 1, 1, 1).map(_.toDouble), Seq("C0")).getBytes)
    put("0/.zarray", ZarrFormat.zarray(
      Seq(1, 1, 1, 4, 4), Seq(1, 1, 1, 2, 2), "<f8").getBytes)
    for (yi <- 0 until 2; xi <- 0 until 2) {
      val px = Array.tabulate(4) { k =>
        val (y, x) = (yi * 2 + k / 2, xi * 2 + k % 2)
        y * 10.0 + x
      }
      put(s"0/0.0.0.$yi.$xi", ZarrFormat.encodeChunk(px, PixelType.Float64))
    }
    val back = BioSpark.open(spark, root)
    assert(back.meta.dims.order == "MTCZYX")
    assert(back.meta.dims('M') == 4)
    assert(back.dims.order == "TCZYX") // stitched view folds M
    assert(back.dims('Y') == 4 && back.dims('X') == 4)
    val nd = back.getImageData("YX")
    for (y <- 0 until 4; x <- 0 until 4)
      assert(nd.array(y, x) == y * 10.0 + x, s"($y,$x)")
    // the disjoint-tile stitch is a projection — no overlap-resolving
    // aggregate in the plan (the only Exchange is the reader's chunk
    // catalog repartition, unrelated to stitching)
    val plan = back.pixels.queryExecution.executedPlan.toString
    assert(!plan.contains("min_by") && !plan.contains("HashAggregate"), plan)
  }

  test("zlib-compressed chunks decode") {
    import java.nio.file.Paths
    import graft.core.PixelType
    import graft.formats.ZarrFormat
    val root = tmp("zlib.zarr")
    Files.createDirectories(Paths.get(root, "0"))
    def put(rel: String, bytes: Array[Byte]): Unit =
      Files.write(Paths.get(root, rel), bytes)
    put(".zgroup", ZarrFormat.zgroup.getBytes)
    put(".zattrs", ZarrFormat.imageAttrs("Image:0", 1,
      Seq.fill(5)(1.0), Seq("C0")).getBytes)
    // .zarray with a zlib compressor object
    put("0/.zarray",
      ("""{"zarr_format":2,"shape":[1,1,1,2,3],"chunks":[1,1,1,2,3],""" +
        """"dtype":"<f8","compressor":{"id":"zlib","level":6},""" +
        """"fill_value":0,"order":"C","filters":null}""").getBytes)
    val raw = ZarrFormat.encodeChunk(
      Array(0.0, 1.0, 2.0, 10.0, 11.0, 12.0), PixelType.Float64)
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    put("0/0.0.0.0.0", out.toByteArray)
    val back = BioSpark.open(spark, root)
    val nd = back.getImageData("YX")
    assert(nd.array(1, 2) == 12.0)
    assert(nd.array(0, 1) == 1.0)
  }

  test("writer raises on unknown selections; mosaic scenes stitch on save") {
    val img = BioSpark.fromArray(spark, NDArray.zeros(Seq(2, 2)))
    intercept[IllegalArgumentException](
      img.save(tmp("x.zarr"), Some(Seq("Image:9"))))
    val arr = NDArray.tabulate(Seq(2, 2, 2))(idx =>
      idx(0) * 100.0 + idx(1) * 10 + idx(2))
    val mosaic = new BioImage(spark,
      new ArrayLikeReader(Seq(arr), Seq(Some("MYX")),
        Seq(None), tilePositions = Seq(Seq((0, 0), (0, 2)))))
    val uri = tmp("m.zarr")
    mosaic.save(uri)
    val back = BioSpark.open(spark, uri)
    assert(back.dims.shape == Seq(1, 1, 1, 2, 4))
    assert(back.getImageData("YX").array(1, 3) == 111.0)
  }
}
