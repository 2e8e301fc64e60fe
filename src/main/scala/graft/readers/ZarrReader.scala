package graft.readers

import java.nio.charset.StandardCharsets

import scala.util.Try

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.SerializableConfiguration
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.{Dimensions, PlaneRow, UnsupportedFileFormatError}
import graft.formats.ZarrFormat
import graft.plugins.{BioReader, PluginEntry, SceneMeta}

/** OME-ZARR (NGFF) source. The store is a directory tree of JSON metadata
  * documents + independent chunk objects, so reads parallelize the same
  * way writes do: the driver parses the handful of .zattrs/.zarray
  * documents into a chunk catalog; executors fetch and decode their chunk
  * files in parallel. Missing chunk objects decode as fill_value planes
  * (zarr semantics). Multiscale datasets surface as resolution levels.
  *
  * Scope: compressor null (raw chunks), chunk shape [1,1,1,H,W] (one
  * plane per chunk — what this engine's writer and bioformats2raw-style
  * single-plane-chunk stores produce).
  */
final class ZarrReader(spark: SparkSession, path: String) extends BioReader {

  /** `shape` is always the expanded 5D TCZYX shape; `axes` records the
    * STORED dim order (2–6 of "tczyxs", y/x last among spatial dims) for
    * chunk-key building; `sSize` > 1 = trailing sample dim (RGB), chunks
    * hold the interleaved YXS block.
    *
    * v3 additions: `keyPrefix` ("c" under the default chunk-key encoding,
    * empty for v2 stores and the v3 "v2" encoding); `shardH`/`shardW` > 0
    * mark a sharded array (codec `sharding_indexed`) — then chunkH/chunkW
    * are the INNER chunk (the read/tile unit) and shardH/shardW the outer
    * shard object, with the inner index at `shardIndexAtEnd` carrying 16
    * bytes per inner chunk (+4 crc32c when `shardIndexCrc`). */
  private case class Level(shape: Seq[Long], axes: String, sSize: Int,
      chunkH: Int, chunkW: Int, dtype: String, compressor: Option[String],
      separator: String, fillValue: Double,
      keyPrefix: String = "", shardH: Int = 0, shardW: Int = 0,
      shardIndexCrc: Boolean = true, shardIndexAtEnd: Boolean = true) {
    def gridY: Int = ((shape(3) + chunkH - 1) / chunkH).toInt
    def gridX: Int = ((shape(4) + chunkW - 1) / chunkW).toInt
    def tiled: Boolean = gridY * gridX > 1
  }
  private case class Scene(id: String, group: String, levels: Seq[Level],
      channelNames: Seq[String], scale: Seq[Double], rawAttrs: String,
      units: Map[Char, String])

  private def fs: FileSystem = FileSystem.get(new Path(path).toUri,
    spark.sparkContext.hadoopConfiguration)

  private def readDoc(p: String): Option[String] = {
    val f = fs
    val hp = new Path(p)
    if (!f.exists(hp)) None
    else {
      val in = f.open(hp)
      try {
        val bytes = new Array[Byte](f.getFileStatus(hp).getLen.toInt)
        in.readFully(0, bytes)
        Some(new String(bytes, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  /** join under the store root, skipping empty segments (root group). */
  private def sub(parts: String*): String =
    (path +: parts.filter(_.nonEmpty)).mkString("/")

  private lazy val scenes_ : Seq[Scene] = {
    // image groups: either the root itself is an image (has multiscales)
    // or numbered child groups are (bioformats2raw layout)
    def parseImage(group: String, idx: Int): Option[Scene] = {
      // v2: .zattrs; v3: zarr.json group node, NGFF 0.5 attrs namespaced
      // under attributes.ome (plain attributes accepted as a fallback)
      val v2attrs = readDoc(sub(group, ".zattrs"))
      val v3doc = if (v2attrs.isDefined) None
        else readDoc(sub(group, "zarr.json"))
      val attrs = v2attrs.orElse(v3doc).getOrElse(return None)
      val j = v2attrs match {
        case Some(a) => JsonMethods.parse(a)
        case None =>
          val a = JsonMethods.parse(attrs) \ "attributes"
          (a \ "ome") match { case JNothing => a; case ome => ome }
      }
      val ms = (j \ "multiscales")(0)
      if (ms == JNothing) return None
      val name = ms \ "name" match {
        case JString(s) if s.nonEmpty => s
        case _                        => s"Image:$idx"
      }
      val datasets = (ms \ "datasets").children
      val levels = datasets.map { ds =>
        val JString(p) = ds \ "path"
        val za = readDoc(sub(group, p, ".zarray"))
          .getOrElse(throw new UnsupportedFileFormatError(
            s"zarr dataset $group/$p has no .zarray"))
        val zj = JsonMethods.parse(za)
        val separator = zj \ "dimension_separator" match {
          case JString(sep) => sep
          case _            => "."
        }
        val fillValue = zj \ "fill_value" match {
          case JInt(v)     => v.toDouble
          case JDouble(v)  => v
          case JDecimal(v) => v.toDouble
          case _           => 0.0
        }
        val compressor = zj \ "compressor" match {
          case JNull => None
          case c => (c \ "id") match {
            case JString("zlib")  => Some("zlib")
            case JString("blosc") => Some("blosc")
            case JString("zstd")  => Some("zstd")
            case other => throw new UnsupportedFileFormatError(
              s"unsupported zarr compressor $other " +
                "(supported: null, zlib, blosc, zstd)")
          }
        }
        val shapeRaw = (zj \ "shape").children.map(_.values.toString.toLong)
        val JString(dtype) = zj \ "dtype"
        val chunks = (zj \ "chunks").children.map(_.values.toString.toLong)
        val rank = shapeRaw.length
        require(rank >= 2 && rank <= 6,
          s"expected 2D-6D zarr array, got ${rank}D")
        require(chunks.length == rank,
          s"chunks rank ${chunks.length} != shape rank $rank")
        // stored dim order: NGFF axes names when declared and consistent,
        // else the trailing suffix of tczyx (the ArrayLike guessing rule);
        // rank 6 means a trailing sample axis (RGB, a graft extension)
        val axesNames = (ms \ "axes").children.flatMap(a => a \ "name" match {
          case JString(n) => Some(n)
          case _          => None
        })
        val axes: String =
          if (axesNames.length == rank &&
            axesNames.forall(n => n.length == 1 && "tczyxs".contains(n)))
            axesNames.mkString
          else if (rank == 6) "tczyxs"
          else "tczyx".takeRight(rank)
        require(axes.endsWith("yx") || axes.endsWith("yxs"),
          s"zarr axes '$axes' must end in y,x[,s] for the plane-chunk model")
        def dimOf(d: Char): Long =
          axes.indexOf(d) match { case -1 => 1L; case i => shapeRaw(i) }
        val shape5 = Seq('t', 'c', 'z', 'y', 'x').map(dimOf)
        val sSize = dimOf('s').toInt
        "tcz".foreach { d =>
          val i = axes.indexOf(d)
          require(i < 0 || chunks(i) == 1,
            s"expected chunk $d extent of 1, got $chunks")
        }
        val sIdx = axes.indexOf('s')
        require(sIdx < 0 || chunks(sIdx) == sSize,
          s"expected full-sample chunks (s extent $sSize), got $chunks")
        val (yIdx, xIdx) = (axes.indexOf('y'), axes.indexOf('x'))
        // Y/X chunk grid may be ragged — edge chunks are stored padded to
        // full chunk shape (zarr v2) and cropped on read
        Level(shape5, axes, sSize, chunks(yIdx).toInt, chunks(xIdx).toInt,
          dtype, compressor, separator, fillValue)
      }
      val channels = (j \ "omero" \ "channels").children.collect {
        case ch if (ch \ "label") != JNothing =>
          val JString(l) = ch \ "label"; l
      }
      // per-axis scales expanded to TCZYX (absent dims scale 1.0)
      val axes0 = levels.head.axes
      val scale = (datasets.head \ "coordinateTransformations")(0) \ "scale" match {
        case JArray(xs) if xs.length == axes0.length =>
          val raw = xs.map(_.values.toString.toDouble)
          Seq('t', 'c', 'z', 'y', 'x').map(d =>
            axes0.indexOf(d) match { case -1 => 1.0; case i => raw(i) })
        case _ => Seq(1.0, 1.0, 1.0, 1.0, 1.0)
      }
      // NGFF axes[].unit — surfaced in dimension_properties, and unit
      // PRESENCE marks the t scale / pixel sizes as declared values
      val units: Map[Char, String] = (ms \ "axes").children.flatMap { a =>
        (a \ "name", a \ "unit") match {
          case (JString(n), JString(u)) if n.length == 1 =>
            Some(n.head.toUpper -> u)
          case _ => None
        }
      }.toMap
      Some(Scene(name, group, levels, channels, scale, attrs, units))
    }

    parseImage("", 0) match {
      case Some(s) => Seq(s)
      case None =>
        Iterator.from(0)
          .map(i => parseImage(i.toString, i))
          .takeWhile(_.isDefined)
          .flatten
          .toSeq match {
            case Seq() => throw new UnsupportedFileFormatError(
              s"'$path' is not an OME-ZARR image store (no multiscales)")
            case ss => ss
          }
    }
  }

  override def name: String = "ZarrReader"
  override def supportedExtensions: Seq[String] = Seq(".ome.zarr", ".zarr")

  override def isSupportedImage(spark: SparkSession, p: String): Boolean =
    Try {
      val f = FileSystem.get(new Path(p).toUri,
        spark.sparkContext.hadoopConfiguration)
      f.exists(new Path(s"$p/.zgroup")) || f.exists(new Path(s"$p/.zarray"))
    }.getOrElse(false)

  override def scenes: Seq[String] = scenes_.map(_.id)

  /** Dims of a level in its TILED form (M leading when gridded, trailing
    * S when the store carries a sample axis). */
  private def levelDimsOf(lv: Level): Dimensions = {
    val sTail = if (lv.sSize > 1) Seq(lv.sSize.toLong) else Seq.empty
    val sCh = if (lv.sSize > 1) "S" else ""
    if (lv.tiled)
      Dimensions("MTCZYX" + sCh,
        ((lv.gridY.toLong * lv.gridX) +: lv.shape.take(3) :+
          lv.chunkH.toLong :+ lv.chunkW.toLong) ++ sTail)
    else Dimensions("TCZYX" + sCh, lv.shape ++ sTail)
  }

  override def sceneMeta(i: Int): SceneMeta = {
    val s = scenes_(i)
    val lv = s.levels.head
    val dims = levelDimsOf(lv)
    val tiles =
      if (lv.tiled)
        for { yi <- 0 until lv.gridY; xi <- 0 until lv.gridX }
          yield (yi * lv.chunkH, xi * lv.chunkW)
      else Seq.empty
    // a declared space/time unit marks scale 1.0 as a REAL value (a
    // genuine 1.0-second interval or 1.0-µm pixel size survives the
    // roundtrip; bare default scales still read as "not provided")
    val spaceDeclared = Seq('Z', 'Y', 'X').exists(s.units.contains)
    SceneMeta(i, s.id, dims,
      channelNames = s.channelNames,
      physicalPixelSizes =
        if (!spaceDeclared && s.scale.drop(2) == Seq(1.0, 1.0, 1.0)) None
        else Some((s.scale(2), s.scale(3), s.scale(4))),
      pixelType = ZarrFormat.pixelTypeOf(lv.dtype),
      tilePositions = tiles,
      rawMetadata = Some(s.rawAttrs),
      timeInterval =
        if (!s.units.contains('T') && s.scale.head == 1.0) None
        else Some(s.scale.head),
      dimUnits = s.units)
  }

  override def resolutionLevels(sceneIdx: Int): Seq[Int] =
    scenes_(sceneIdx).levels.indices

  override def levelDims(sceneIdx: Int, level: Int): Dimensions = {
    val s = scenes_(sceneIdx)
    if (!s.levels.isDefinedAt(level))
      throw new IndexOutOfBoundsException(s"resolution level $level")
    levelDimsOf(s.levels(level))
  }

  /** Each level's tile grid comes from that level's own .zarray chunks —
    * floor-halving level-0 positions disagrees with the actual rows when
    * levels carry fixed chunk sizes or a single-chunk coarse level. */
  override def levelTilePositions(sceneIdx: Int, level: Int): Seq[(Int, Int)] = {
    val s = scenes_(sceneIdx)
    if (!s.levels.isDefinedAt(level))
      throw new IndexOutOfBoundsException(s"resolution level $level")
    val lv = s.levels(level)
    if (!lv.tiled) Seq.empty
    else for { yi <- 0 until lv.gridY; xi <- 0 until lv.gridX }
      yield (yi * lv.chunkH, xi * lv.chunkW)
  }

  /** True stitched shape IS the zarr array shape at that level. */
  override def stitchedLevelDims(sceneIdx: Int, level: Int): Dimensions = {
    val s = scenes_(sceneIdx)
    if (!s.levels.isDefinedAt(level))
      throw new IndexOutOfBoundsException(s"resolution level $level")
    val lv = s.levels(level)
    if (lv.sSize > 1)
      Dimensions("TCZYXS", lv.shape :+ lv.sSize.toLong)
    else Dimensions("TCZYX", lv.shape)
  }

  override def readDelayed(spark: SparkSession, sceneIdx: Int): DataFrame =
    readDelayedAtLevel(spark, sceneIdx, 0)

  override def readDelayedAtLevel(spark: SparkSession, sceneIdx: Int,
      level: Int): DataFrame = {
    import spark.implicits._
    val s = scenes_(sceneIdx)
    if (!s.levels.isDefinedAt(level))
      throw new IndexOutOfBoundsException(s"resolution level $level")
    val lv = s.levels(level)
    val Seq(t, c, z, planeH, planeW) = lv.shape.map(_.toInt)
    val (ch, cw) = (lv.chunkH, lv.chunkW)
    val (ny, nx) = (lv.gridY, lv.gridX)
    val nS = lv.sSize
    val axes = lv.axes
    val dtype = lv.dtype
    val compressor = lv.compressor
    val sep = lv.separator
    val fill = lv.fillValue
    val sid = s.id
    val base = sub(s.group, level.toString)
    val hconf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // one catalog row per CHUNK: (t,c,z) x the Y/X tile grid; tiles carry
    // their mosaic index + offsets so the stitch is a pure projection
    val keys = for {
      ti <- 0 until t; ci <- 0 until c; zi <- 0 until z
      yi <- 0 until ny; xi <- 0 until nx
    } yield (ti, ci, zi, yi, xi)
    val slices = math.min(keys.length,
      spark.sparkContext.defaultParallelism).max(1)
    spark.createDataset(keys)
      .repartition(slices)
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val f = FileSystem.get(new java.net.URI(base + "/"), hconf.value)
          it.flatMap { case (ti, ci, zi, yi, xi) =>
            // zarr v2 dimension_separator: "." (flat) or "/" (nested);
            // the key has one component per STORED dim, in stored order
            // (the sample dim is one full-extent chunk → index 0)
            val idx = Map('t' -> ti, 'c' -> ci, 'z' -> zi,
              'y' -> yi, 'x' -> xi, 's' -> 0)
            val key = axes.map(idx).mkString(sep)
            // edge chunks are stored padded to full chunk shape; crop to
            // the array bounds (ragged grids, zarr v2 semantics)
            val cropH = math.min(ch, planeH - yi * ch)
            val cropW = math.min(cw, planeW - xi * cw)
            val p = new Path(s"$base/$key")
            val full: Option[Array[Double]] =
              if (!f.exists(p)) None // missing chunk → fill_value planes
              else {
                val in = f.open(p)
                try {
                  val n = f.getFileStatus(p).getLen.toInt
                  val bytes = new Array[Byte](n)
                  in.readFully(0, bytes)
                  Some(ZarrFormat.decodeChunk(bytes, dtype, compressor))
                } finally in.close()
              }
            (0 until nS).map { si =>
              val px = full match {
                case None => Array.fill(cropH * cropW)(fill)
                case Some(data) =>
                  // de-interleave the sample band, then crop edge padding
                  val out = new Array[Double](cropH * cropW)
                  var r = 0
                  while (r < cropH) {
                    var x = 0
                    while (x < cropW) {
                      out(r * cropW + x) = data((r * cw + x) * nS + si)
                      x += 1
                    }
                    r += 1
                  }
                  out
              }
              PlaneRow(sceneIdx, sid, level, m = yi * nx + xi,
                t = ti, c = ci, z = zi, s = si,
                y0 = yi * ch, x0 = xi * cw, h = cropH, w = cropW,
                pixels = px)
            }
          }
        }
      }
      .toDF()
  }
}

object ZarrReader {
  val plugin: PluginEntry = PluginEntry(
    name = "ZarrReader",
    extensions = Seq(".ome.zarr", ".zarr"),
    open = (spark, path, _) => new ZarrReader(spark, path))
}
