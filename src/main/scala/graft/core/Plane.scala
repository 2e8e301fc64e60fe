package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One row per 2D Y×X plane — the engine's canonical distributed image
  * representation (SURVEY.md §1.5). A 5D–7D TCZYX[+M][+S] scene becomes a
  * long-form table keyed by (scene_idx, level, m, t, c, z, s); the plane
  * payload is a row-major Array[Double].
  *
  * Scale design: planes parquet is partitioned by (scene_idx, level) and
  * sorted by (t, c, z) so scene/level selection is partition pruning and
  * T/C/Z selection is row-group pruning; Y/X slicing operates on the array
  * payload inside codegen without touching other planes.
  */
final case class PlaneRow(
    scene_idx: Int,
    scene_id: String,
    level: Int,
    m: Int, // mosaic tile index (0 when non-mosaic)
    t: Int,
    c: Int,
    z: Int,
    s: Int, // sample index (0 when no S dim)
    y0: Int, // mosaic tile top offset in stitched space
    x0: Int, // mosaic tile left offset in stitched space
    h: Int,
    w: Int,
    pixels: Array[Double])

object Plane {
  /** Long-form pixel view of a plane table: one row per pixel with LOCAL
    * (per-tile) y/x coordinates. `keep` passes extra input columns (e.g.
    * the store's px_min/px_max stats) through the explode. */
  def pixels(planes: DataFrame, keep: Seq[String] = Seq.empty): DataFrame =
    planes.select(Seq(col("scene_idx"), col("level"), col("m"), col("t"),
        col("c"), col("z"), col("s"), col("w"), col("y0"), col("x0")) ++
        keep.map(col) :+
        posexplode(col("pixels")).as(Seq("pos", "v")): _*)
      .withColumn("y", (col("pos") / col("w")).cast("int"))
      .withColumn("x", pmod(col("pos"), col("w")).cast("int"))
      .drop("pos", "w")

  /** Pixel view in STITCHED mosaic space (y/x shifted by tile offsets). */
  def stitchedPixels(planes: DataFrame, keep: Seq[String] = Seq.empty): DataFrame =
    pixels(planes, keep)
      .withColumn("y", col("y") + col("y0"))
      .withColumn("x", col("x") + col("x0"))
      .drop("y0", "x0")

  /** 2× mean-pool of a plane table (the pyramid step shared by the
    * parquet plane store and the zarr writer): each (t,c,z,s,m) plane
    * pools independently; edge blocks average the pixels that exist (ceil
    * semantics); tile offsets halve with the geometry; the level column
    * increments. Distributed: groupBy on halved coordinates, two shuffles
    * per level, each over 4× less data than the previous. */
  def poolHalf(planes: DataFrame): DataFrame = {
    val keys = Seq("scene_idx", "scene_id", "m", "t", "c", "z", "s")
    val px = planes.select(
      keys.map(col) ++ Seq(col("level"), col("y0"), col("x0"), col("h"),
        col("w"), posexplode(col("pixels")).as(Seq("pos", "v"))): _*)
      .withColumn("h2", expr("(h + 1) div 2").cast("int"))
      .withColumn("w2", expr("(w + 1) div 2").cast("int"))
      .withColumn("py", expr("(pos div w) div 2").cast("int"))
      .withColumn("px", expr("(pos % w) div 2").cast("int"))
    val pooled = px
      .groupBy(keys.map(col) ++ Seq(col("level"), expr("y0 div 2").as("y0"),
        expr("x0 div 2").as("x0"), col("h2"), col("w2"), col("py"),
        col("px")): _*)
      .agg(avg(col("v")).as("v"))
    pooled
      .withColumn("pv", struct((col("py") * col("w2") + col("px")).as("p"),
        col("v").as("v")))
      .groupBy(keys.map(col) ++ Seq(col("level"), col("y0"), col("x0"),
        col("h2"), col("w2")): _*)
      .agg(transform(array_sort(collect_list(col("pv"))),
        p => p.getField("v")).as("pixels"))
      .select(col("scene_idx"), col("scene_id"),
        (col("level") + 1).cast("int").as("level"), col("m"), col("t"),
        col("c"), col("z"), col("s"), col("y0").cast("int").as("y0"),
        col("x0").cast("int").as("x0"), col("h2").as("h"), col("w2").as("w"),
        col("pixels"))
  }
}
