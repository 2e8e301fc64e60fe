package graft.image

import java.nio.file.Files

import graft.{BioSpark, SparkSpec}
import graft.core.NDArray
import graft.readers.ArrayLikeReader
import graft.writers.{ParquetPlaneReader, ParquetPlaneStore}

class MosaicSpec extends SparkSpec {
  private def mosaicImage(positions: Seq[(Int, Int)],
      reconstruct: Boolean = true): BioImage = {
    val arr = NDArray.tabulate(Seq(positions.length, 2, 2))(idx =>
      idx(0) * 100.0 + idx(1) * 10 + idx(2))
    new BioImage(spark,
      new ArrayLikeReader(Seq(arr), Seq(Some("MYX")), Seq(None),
        tilePositions = Seq(positions)),
      reconstructMosaic = reconstruct)
  }

  test("stitch places tiles at canonical positions") {
    val img = mosaicImage(Seq((0, 0), (0, 2), (2, 0), (2, 2)))
    assert(img.dims.order == "TCZYX") // M folded away
    assert(img.dims('Y') == 4 && img.dims('X') == 4)
    val nd = img.getImageData("YX")
    assert(nd.array(0, 0) == 0.0)
    assert(nd.array(0, 2) == 100.0) // tile 1 origin
    assert(nd.array(2, 0) == 200.0) // tile 2
    assert(nd.array(3, 3) == 311.0) // tile 3 (1,1)
  }

  test("overlap resolves to lowest tile index (first wins)") {
    val img = mosaicImage(Seq((0, 0), (0, 1))) // tiles overlap at x=1
    val nd = img.getImageData("YX")
    assert(nd.array.shape == Seq(2, 3))
    assert(nd.array(0, 1) == 1.0) // tile 0's (0,1), not tile 1's (0,0)=100
    assert(nd.array(0, 2) == 101.0)
  }

  test("disjoint tiles stitch with a projection-only plan (no Exchange)") {
    val img = mosaicImage(Seq((0, 0), (0, 2), (2, 0), (2, 2)))
    val plan = img.pixels.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"disjoint stitch must not shuffle:\n$plan")
  }

  test("overlapping tiles stitch through the overlap-resolving aggregate") {
    val img = mosaicImage(Seq((0, 0), (0, 1)))
    val plan = img.pixels.queryExecution.executedPlan.toString
    assert(plan.contains("min_by") || plan.contains("Aggregate"),
      s"overlap stitch must aggregate:\n$plan")
  }

  test("reconstruct=false falls back to tiled M-dim data") {
    val img = mosaicImage(Seq((0, 0), (0, 2)), reconstruct = false)
    assert(img.dims.order == "MTCZYX")
    assert(img.dims('M') == 2)
    val nd = img.getImageData("MYX")
    assert(nd.array(1, 1, 1) == 111.0)
  }

  test("tile position lookup and bounds") {
    val img = mosaicImage(Seq((0, 0), (0, 2)))
    assert(img.getMosaicTilePosition(1) == ((0, 2)))
    assert(img.mosaicTileDims.contains((2L, 2L)))
    intercept[IndexOutOfBoundsException](img.getMosaicTilePosition(7))
    val flat = BioSpark.fromArray(spark, NDArray.zeros(Seq(2, 2)))
    intercept[UnsupportedOperationException](flat.getMosaicTilePosition(0))
    assert(flat.mosaicTileDims.isEmpty)
  }
}

class StoreSpec extends SparkSpec {
  test("save → reopen roundtrip preserves pixels, renumbers scenes") {
    val arrs = (0 until 2).map(i =>
      NDArray.tabulate(Seq(2, 2, 2))(idx =>
        i * 1000.0 + idx(0) * 100 + idx(1) * 10 + idx(2)))
    val img = new BioImage(spark, ArrayLikeReader.multi(arrs,
      channelNames = Seq(None, Some(Seq.empty)).take(1)))
    val dir = Files.createTempDirectory("graft-store").toString + "/img.graft"
    ParquetPlaneStore.save(img, dir, selectScenes = Some(Seq("Image:1")))
    val back = BioSpark.open(spark, dir)
    assert(back.reader.name == "ParquetPlaneReader")
    assert(back.scenes == Seq("Image:0")) // renumbered, order preserved
    val nd = back.getImageData("ZYX")
    assert(nd.array(1, 1, 1) == 1111.0)
    assert(back.dims.shape == Seq(1, 1, 2, 2, 2))
    assert(back.channelNames == Seq("Channel:0:0"))
  }

  test("pyramid: levels materialize, per-level dims, level switch") {
    val arr = NDArray.tabulate(Seq(8, 8))(idx => idx(0) * 10.0 + idx(1))
    val img = BioSpark.fromArray(spark, arr)
    val dir = Files.createTempDirectory("graft-pyr").toString + "/img.graft"
    ParquetPlaneStore.save(img, dir, levels = 3)
    val back = BioSpark.open(spark, dir)
    assert(back.resolutionLevels == Seq(0, 1, 2))
    assert(back.resolutionLevelDims == Map(
      0 -> Seq(1, 1, 1, 8, 8), 1 -> Seq(1, 1, 1, 4, 4),
      2 -> Seq(1, 1, 1, 2, 2)))
    back.setResolutionLevel(1)
    assert(back.dims.shape == Seq(1, 1, 1, 4, 4)) // dims reflect the level
    val nd = back.getImageData("YX")
    // mean of block {(0,0),(0,1),(1,0),(1,1)} = (0+1+10+11)/4
    assert(nd.array(0, 0) == 5.5)
    assert(nd.array(3, 3) == (66.0 + 67 + 76 + 77) / 4)
    back.setResolutionLevel(2)
    assert(back.getImageData("YX").array.shape == Seq(2, 2))
    // odd-size edge semantics: 5 wide pools to 3 (ceil)
    val odd = BioSpark.fromArray(spark,
      NDArray.tabulate(Seq(5, 5))(idx => idx(0) * 10.0 + idx(1)))
    val dir2 = Files.createTempDirectory("graft-pyr").toString + "/odd.graft"
    ParquetPlaneStore.save(odd, dir2, levels = 2)
    val back2 = BioSpark.open(spark, dir2)
    back2.setResolutionLevel(1)
    assert(back2.dims.shape == Seq(1, 1, 1, 3, 3))
    val nd2 = back2.getImageData("YX")
    assert(nd2.array(2, 2) == 44.0) // lone corner pixel averages itself
  }

  test("gapped mosaics fail loudly when stitched into dense planes") {
    // tiles at (0,0) and (2,2): stitched bbox 4x4 but only 8 pixels exist
    val arr2 = NDArray.tabulate(Seq(2, 2, 2))(idx =>
      idx(0) * 100.0 + idx(1) * 10 + idx(2))
    val img = new BioImage(spark,
      new ArrayLikeReader(Seq(arr2), Seq(Some("MYX")), Seq(None),
        tilePositions = Seq(Seq((0, 0), (2, 2)))))
    val e = intercept[Exception] {
      img.stitchedPlanes.write.format("noop").mode("overwrite").save()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("do not cover")), e)
  }

  test("mosaic pyramid: level dims use level-scaled tile positions") {
    val arr = NDArray.tabulate(Seq(2, 4, 4))(idx =>
      idx(0) * 100.0 + idx(1) * 10 + idx(2))
    val img = new BioImage(spark,
      new ArrayLikeReader(Seq(arr), Seq(Some("MYX")), Seq(None),
        tilePositions = Seq(Seq((0, 0), (0, 4)))))
    assert(img.dims('Y') == 4 && img.dims('X') == 8)
    val dir = Files.createTempDirectory("graft-mpyr").toString + "/m.graft"
    ParquetPlaneStore.save(img, dir, levels = 2)
    val back = BioSpark.open(spark, dir)
    back.setResolutionLevel(1)
    // tiles halve to 2x2 at (0,0),(0,2) → stitched level-1 plane is 2x4
    assert(back.dims('Y') == 2 && back.dims('X') == 4)
    val nd = back.getImageData("YX")
    assert(nd.array.shape == Seq(2, 4))
    assert(nd.array(0, 0) == (0.0 + 1 + 10 + 11) / 4) // tile 0 pool
    assert(nd.array(0, 2) == (100.0 + 101 + 110 + 111) / 4) // tile 1 pool
  }

  test("save raises on unknown scene ids and empty selection") {
    val img = new BioImage(spark, ArrayLikeReader.multi(
      Seq(NDArray.zeros(Seq(2, 2)))))
    val dir = Files.createTempDirectory("graft-store").toString + "/img.graft"
    val e = intercept[IllegalArgumentException](
      ParquetPlaneStore.save(img, dir, selectScenes = Some(Seq("Image:9"))))
    assert(e.getMessage.contains("Image:9"))
    intercept[IllegalArgumentException](
      ParquetPlaneStore.save(img, dir, selectScenes = Some(Seq.empty)))
  }

  test("scene/level scan is partition-pruned") {
    val img = new BioImage(spark, ArrayLikeReader.multi(
      (0 until 3).map(_ => NDArray.zeros(Seq(2, 2)))))
    val dir = Files.createTempDirectory("graft-store").toString + "/img.graft"
    ParquetPlaneStore.save(img, dir)
    val rd = new ParquetPlaneReader(spark, dir)
    val plan = rd.readDelayedAtLevel(spark, 1, 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("scene_idx"), "scene_idx must be a partition filter")
  }
}
