package graft.writers

import graft.core.UnsupportedFileFormatError
import graft.image.BioImage

/** Writer SPI — the analog of the reference's Writer contract + writer
  * registry (/root/reference/bioio/writers/__init__.py:10-15, contract
  * observable in tests/helpers/mock_writer.py:63-75; registry table
  * README.md:78-85). `save` consumes a BioImage and a target URI; scene
  * selection semantics (regenerated ids, preserved order, raise on
  * unknown) follow BioImage.save (bio_image.py:1229-1301). */
trait BioWriter {
  def name: String
  /** advertised extensions, normalized (lowercase, leading dot). */
  def supportedExtensions: Seq[String]
  def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]] = None): Unit
  /** Options-carrying save — the kwargs channel of the reference's
    * `BioImage.save` (bio_image.py:1229-1301): writers with layout/codec
    * knobs override this and parse their own keys; the base accepts only
    * an empty map, so an option reaching a writer that can't honor it
    * raises instead of being dropped on the floor. */
  def save(img: BioImage, uri: String, selectScenes: Option[Seq[String]],
      options: Map[String, String]): Unit = {
    require(options.isEmpty,
      s"$name accepts no writer options; got ${options.keys.mkString(", ")}")
    save(img, uri, selectScenes)
  }
}

/** Shared parsing for writer option maps (all values arrive as strings
  * through the extension-dispatch facade). */
object WriterOptions {
  def unknown(options: Map[String, String], known: Set[String],
      writer: String): Unit = {
    val bad = options.keySet.diff(known)
    require(bad.isEmpty, s"$writer: unknown writer option(s) " +
      s"${bad.mkString(", ")} (supported: ${known.toSeq.sorted.mkString(", ")})")
  }
  def int(options: Map[String, String], key: String): Option[Int] =
    options.get(key).map { v =>
      try v.trim.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"writer option $key must be an integer, got '$v'")
      }
    }
  def bool(options: Map[String, String], key: String): Option[Boolean] =
    options.get(key).map { v =>
      v.trim.toLowerCase match {
        case "true" | "1"  => true
        case "false" | "0" => false
        case other => throw new IllegalArgumentException(
          s"writer option $key must be true/false, got '$other'")
      }
    }
  /** "256x256" (or "256,256") → (h, w). */
  def dims(options: Map[String, String], key: String): Option[(Int, Int)] =
    options.get(key).map { v =>
      v.trim.split("[x,]") match {
        case Array(a, b) =>
          try (a.trim.toInt, b.trim.toInt) catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"writer option $key must be HxW, got '$v'")
          }
        case _ => throw new IllegalArgumentException(
          s"writer option $key must be HxW, got '$v'")
      }
    }
}

/** Writer registry: extension-dispatched save (most specific suffix
  * first, mirroring the reader registry's ordering policy). */
object Writers {
  /** Shared scene-selection validation (every writer's contract): unknown
    * ids and empty selections raise; returns the resolved selection. */
  def validateSelection(img: BioImage,
      selectScenes: Option[Seq[String]]): Seq[String] = {
    val sel = selectScenes.getOrElse(img.scenes)
    val unknown = sel.filterNot(img.scenes.contains)
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"Unknown scene id(s) ${unknown.mkString("[", ", ", "]")}; " +
          s"available scenes: ${img.scenes.mkString("[", ", ", "]")}")
    if (sel.isEmpty)
      throw new IllegalArgumentException(
        "Empty scene selection — nothing to save")
    sel
  }
  /** ParquetPlaneStore registered alongside OME-TIFF: the store is the
    * engine's scale-path interchange; OME-TIFF is the reference's
    * canonical sink. */
  def default: Seq[BioWriter] =
    Seq(OmeTiffWriter, ParquetPlaneStoreWriter, ZarrWriter, TwoDWriter,
      TimeSeriesWriter, NpyWriter, NpzWriter, MrcWriter, TarWriter,
      AviWriter)

  def forPath(path: String, writers: Seq[BioWriter] = default): BioWriter = {
    val lower = path.toLowerCase.takeWhile(_ != '?')
    val matches = for {
      w <- writers
      e <- w.supportedExtensions
      if lower.endsWith(e)
    } yield (e.length, w)
    matches.sortBy(-_._1).headOption.map(_._2).getOrElse(
      throw new UnsupportedFileFormatError(
        s"No writer supports '$path'. Registered: " +
          writers.map(w => s"${w.name}${w.supportedExtensions.mkString("(", ",", ")")}")
            .mkString(", ")))
  }

  def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]] = None,
      writers: Seq[BioWriter] = default): Unit =
    forPath(uri, writers).save(img, uri, selectScenes)

  def save(img: BioImage, uri: String, selectScenes: Option[Seq[String]],
      options: Map[String, String]): Unit =
    forPath(uri, default).save(img, uri, selectScenes, options)
}

/** BioWriter face of the parquet plane store. */
object ParquetPlaneStoreWriter extends BioWriter {
  override def name: String = "ParquetPlaneStoreWriter"
  override def supportedExtensions: Seq[String] = Seq(ParquetPlaneStore.Extension)
  override def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]]): Unit =
    ParquetPlaneStore.save(img, uri, selectScenes)
  override def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]],
      options: Map[String, String]): Unit = {
    WriterOptions.unknown(options, Set("levels"), name)
    ParquetPlaneStore.save(img, uri, selectScenes,
      levels = WriterOptions.int(options, "levels").getOrElse(1))
  }
}
