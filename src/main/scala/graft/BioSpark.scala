package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.NDArray
import graft.image.{BioImage, NDStack}
import graft.plugins.{PluginEntry, Registry}
import graft.readers.{ArrayLikeReader, ImageIoReader, MrcReader, NpyReader, NpzReader, OmeTiffReader, ZarrReader}
import graft.writers.ParquetPlaneReader

/** One-shot functional API — the analog of the reference's module-level
  * imread family (/root/reference/bioio/bio_image.py:1327-1447) plus the
  * default reader registry.
  */
object BioSpark {
  /** Default registry: ServiceLoader-discovered plugins (version-gated,
    * the reference's entry-point discovery analog), falling back to the
    * built-in set if discovery yields nothing (e.g. exotic classloader).
    * Extend with registerPlugin-style composition by constructing a new
    * Registry. */
  def defaultRegistry: Registry = {
    val discovered = graft.plugins.Registry.discovered()
    if (discovered.nonEmpty) new Registry(discovered)
    else new Registry(Seq(OmeTiffReader.plugin, ParquetPlaneReader.plugin,
      ZarrReader.plugin, ImageIoReader.plugin, NpyReader.plugin,
      NpzReader.plugin, MrcReader.plugin))
  }

  /** Open a path via plugin resolution (with s3-anon retry). */
  def open(spark: SparkSession, path: String,
      registry: Registry = defaultRegistry,
      fsKwargs: Map[String, String] = Map.empty): BioImage = {
    val (_, reader) = registry.determinePluginWithRetry(spark, path, fsKwargs)
    new BioImage(spark, reader)
  }

  /** Wrap an in-memory array as an image (ArrayLike source). */
  def fromArray(spark: SparkSession, arr: NDArray,
      dimOrder: Option[String] = None,
      channelNames: Option[Seq[String]] = None): BioImage =
    new BioImage(spark, ArrayLikeReader(arr, dimOrder, channelNames))

  /** imread: open + current-scene lazy plane DataFrame (dask analog). */
  def imread(spark: SparkSession, path: String, scene: Option[String] = None): DataFrame = {
    val img = open(spark, path)
    scene.foreach(img.setScene)
    img.planes
  }

  /** imread eager: full current scene as an NDStack (numpy analog). */
  def imreadData(spark: SparkSession, path: String,
      scene: Option[String] = None): NDStack = {
    val img = open(spark, path)
    scene.foreach(img.setScene)
    img.getImageData(img.dims.order)
  }
}
