package graft.readers

import java.nio.file.Files

import graft.{BioSpark, SparkSpec}
import graft.core.{NDArray, PixelType}
import graft.formats.TiffFormat
import graft.image.BioImage
import graft.meta.OmeXml
import graft.writers.{OmeTiffWriter, ParquetPlaneStoreWriter, Writers}

class TiffFormatSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("plane encode/decode roundtrip for every storable pixel type") {
    import java.nio.ByteOrder.LITTLE_ENDIAN
    val vals = Array(0.0, 1.0, 7.0, 100.0, 63.0) // fits every storable type
    for (pt <- Seq(PixelType.Int8, PixelType.UInt8, PixelType.Int16,
        PixelType.UInt16, PixelType.Int32, PixelType.UInt32,
        PixelType.Float32, PixelType.Float64)) {
      val bytes = TiffFormat.encodePlane(vals, pt)
      val back = TiffFormat.decodePlane(bytes,
        TiffFormat.bytesPerSample(pt) * 8, TiffFormat.sampleFormat(pt),
        LITTLE_ENDIAN)
      assert(back.toSeq == vals.toSeq, s"roundtrip failed for $pt")
    }
  }

  test("complex types are rejected") {
    intercept[IllegalArgumentException](
      TiffFormat.bytesPerSample(PixelType.Complex64))
  }

  test("OME-XML emit/parse roundtrip") {
    val ome = graft.meta.OME(Seq(graft.meta.OmeImage("Image:0", "scene \"A\" <1>",
      graft.meta.OmePixels("Pixels:0", "XYZCT", "double", 4, 3, 2, 2, 1,
        Some(0.5), Some(0.5), Some(2.0), Some(1.5),
        Seq(graft.meta.OmeChannel("Channel:0:0", Some("DAPI")),
          graft.meta.OmeChannel("Channel:0:1", Some("GFP")))))))
    val back = OmeXml.fromXml(OmeXml.toXml(ome))
    assert(back == ome)
  }
}

class OmeTiffSpec extends SparkSpec {

  private def formulaic(shape: Seq[Int]): NDArray =
    NDArray.tabulate(shape)(idx =>
      idx.zipWithIndex.map { case (v, i) =>
        v * math.pow(10, shape.length - 1 - i)
      }.sum)

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-tiff").toString + "/" + name

  test("write → plugin-resolve → read roundtrip preserves pixels and dims") {
    val img = BioSpark.fromArray(spark, formulaic(Seq(2, 3, 4, 5))) // CZYX
    val uri = tmp("img.ome.tiff")
    img.save(uri)
    val back = BioSpark.open(spark, uri)
    assert(back.reader.name == "OmeTiffReader")
    assert(back.scenes == Seq("Image:0"))
    assert(back.dims.order == "TCZYX")
    assert(back.dims.shape == Seq(1, 2, 3, 4, 5))
    val nd = back.getImageData("CZYX")
    assert(nd.array.shape == Seq(2, 3, 4, 5))
    assert(nd.array(1, 2, 3, 4) == 1234.0)
    assert(nd.array(0, 0, 0, 0) == 0.0)
    // raw OME-XML preserved (M9), parses as OME (M8)
    assert(back.rawMetadata.exists(_.contains("<OME")))
    assert(back.omeMetadata.images.head.pixels.sizeX == 5)
  }

  test("multi-scene save renumbers ids and preserves order; selection works") {
    val arrs = (0 until 3).map(i =>
      NDArray.tabulate(Seq(2, 2))(idx => i * 100.0 + idx(0) * 10 + idx(1)))
    val img = new BioImage(spark, ArrayLikeReader.multi(arrs))
    val uri = tmp("multi.ome.tiff")
    img.save(uri, selectScenes = Some(Seq("Image:2", "Image:0")))
    val back = BioSpark.open(spark, uri)
    assert(back.scenes == Seq("Image:0", "Image:1")) // renumbered, order kept
    assert(back.getImageData("YX").array(1, 1) == 211.0) // was Image:2
    back.setScene("Image:1")
    assert(back.getImageData("YX").array(1, 1) == 11.0) // was Image:0
  }

  test("channel names, pps and timeInterval survive the roundtrip") {
    val img = BioSpark.fromArray(spark, NDArray.zeros(Seq(2, 2, 2)),
      Some("CYX"), Some(Seq("DAPI", "GFP")))
    val uri = tmp("meta.ome.tiff")
    img.save(uri)
    val back = BioSpark.open(spark, uri)
    assert(back.channelNames == Seq("DAPI", "GFP"))
    val ome = back.omeMetadata
    assert(ome.images.head.pixels.channels.flatMap(_.name) == Seq("DAPI", "GFP"))
  }

  test("big-endian multi-strip TIFF parses (foreign-writer layout)") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-crafted MM (big-endian) TIFF: one 2x2 uint8 plane stored as
    // TWO strips of one row each — the layout a foreign writer produces
    val b = ByteBuffer.allocate(256).order(ByteOrder.BIG_ENDIAN)
    b.put('M'.toByte).put('M'.toByte).putShort(42)
    b.putInt(12) // first IFD offset
    b.position(8)
    b.put(Array[Byte](1, 2)) // strip 0 at offset 8: row y=0
    b.put(Array[Byte](3, 4)) // strip 1 at offset 10: row y=1
    b.position(12)
    // IFD: 8 entries (width, length, bits, compression, strip offsets,
    // rows/strip, strip counts, sample format)
    b.putShort(8)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      b.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3 && count == 1) b.putShort(value.toShort).putShort(0)
      else b.putInt(value)
    }
    val stripOffsetsAt = 12 + 2 + 8 * 12 + 4 // after the IFD
    entry(256, 4, 1, 2) // width
    entry(257, 4, 1, 2) // length
    entry(258, 3, 1, 8) // bits
    entry(259, 3, 1, 1) // no compression
    entry(273, 4, 2, stripOffsetsAt) // strip offsets (out-of-line, 2 longs)
    entry(278, 4, 1, 1) // rows per strip = 1
    entry(279, 4, 2, stripOffsetsAt + 8) // strip byte counts
    entry(339, 3, 1, 1) // unsigned int
    b.putInt(0) // no next IFD
    b.putInt(8).putInt(10) // strip offsets
    b.putInt(2).putInt(2) // strip byte counts
    val p = tmp("bigendian.tif")
    Files.write(java.nio.file.Paths.get(p),
      java.util.Arrays.copyOf(b.array(), b.position()))
    val back = BioSpark.open(spark, p)
    val nd = back.getImageData("YX")
    assert(nd.array(0, 0) == 1.0 && nd.array(0, 1) == 2.0)
    assert(nd.array(1, 0) == 3.0 && nd.array(1, 1) == 4.0)
  }

  test("plain TIFF (no OME-XML) reads as Z-stacked single scene") {
    // craft a 2-IFD plain TIFF via the writer then strip... simpler: the
    // writer always embeds OME-XML, so build a tiny plain TIFF by hand
    val vals = Array(1.0, 2.0, 3.0, 4.0)
    val strip = TiffFormat.encodePlane(vals, PixelType.UInt8)
    val ifd0 = TiffFormat.ifdBytes(TiffFormat.planeEntries(
      2, 2, PixelType.UInt8, 8, None), 8L + strip.length + 2 + 10 * 12 + 4)
    val ifd1 = TiffFormat.ifdBytes(TiffFormat.planeEntries(
      2, 2, PixelType.UInt8, 8, None), 0)
    val bytes = TiffFormat.headerBytes(8L + strip.length) ++ strip ++ ifd0 ++ ifd1
    val p = tmp("plain.tif")
    Files.write(java.nio.file.Paths.get(p), bytes)
    val back = BioSpark.open(spark, p)
    assert(back.dims.shape == Seq(1, 1, 2, 2, 2)) // 2 IFDs on Z
    val nd = back.getImageData("ZYX")
    assert(nd.array(0, 1, 1) == 4.0)
    assert(nd.array(1, 0, 1) == 2.0)
  }

  test("writer raises on unknown scene and empty selection") {
    val img = BioSpark.fromArray(spark, NDArray.zeros(Seq(2, 2)))
    intercept[IllegalArgumentException](
      img.save(tmp("x.ome.tiff"), Some(Seq("Image:9"))))
    intercept[IllegalArgumentException](
      img.save(tmp("x.ome.tiff"), Some(Seq.empty)))
  }

  test("mosaic scenes stitch on save (tiles reassembled into full planes)") {
    val arr = NDArray.tabulate(Seq(2, 2, 2))(idx =>
      idx(0) * 100.0 + idx(1) * 10 + idx(2))
    val mosaic = new BioImage(spark,
      new ArrayLikeReader(Seq(arr), Seq(Some("MYX")),
        Seq(None), tilePositions = Seq(Seq((0, 0), (0, 2)))))
    val uri = tmp("m.ome.tiff")
    mosaic.save(uri)
    val back = BioSpark.open(spark, uri)
    assert(back.dims.shape == Seq(1, 1, 1, 2, 4)) // 2x(2x2) side by side
    val nd = back.getImageData("YX")
    assert(nd.array(1, 1) == 11.0) // tile 0 (1,1)
    assert(nd.array(1, 3) == 111.0) // tile 1 (1,1)
  }

  test("writer registry dispatches by most specific extension") {
    assert(Writers.forPath("/a/b.ome.tiff") == OmeTiffWriter)
    assert(Writers.forPath("/a/b.graft") == ParquetPlaneStoreWriter)
    assert(Writers.forPath("/a/b.ome.zarr") == graft.writers.ZarrWriter)
    intercept[graft.core.UnsupportedFileFormatError](
      Writers.forPath("/a/b.nd2"))
  }

  test("fsspec-style URIs: explicit file:// scheme resolves through Hadoop FS") {
    // S9: the readers go through Hadoop FileSystem, so any configured
    // scheme (file:, hdfs:, s3a:, gs: …) works; exercised with file://
    val img = BioSpark.fromArray(spark, formulaic(Seq(3, 4)))
    val plain = tmp("uri.ome.tiff")
    img.save(plain)
    val back = BioSpark.open(spark, "file://" + plain)
    assert(back.reader.name == "OmeTiffReader")
    assert(back.getImageData("YX").array(2, 3) == 23.0)
  }

  test("feasibility report covers the tiff plugin") {
    val uri = tmp("probe.ome.tiff")
    BioSpark.fromArray(spark, NDArray.zeros(Seq(2, 2))).save(uri)
    val rep = BioSpark.defaultRegistry.feasibilityReport(spark, uri)
    assert(rep("OmeTiffReader").supported)
  }
}
