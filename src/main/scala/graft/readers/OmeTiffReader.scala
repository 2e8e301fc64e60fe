package graft.readers

import java.nio.ByteOrder

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.SerializableConfiguration

import graft.core.{Dimensions, Dims, PixelType, PlaneRow, UnsupportedFileFormatError}
import graft.formats.TiffFormat
import graft.meta.{OME, OmeXml}
import graft.plugins.{BioReader, PluginEntry, SceneMeta}

/** OME-TIFF source (S12) — the reference's flagship format family
  * (/root/reference/README.md:55-70; reader contract shape
  * tests/helpers/mock_reader.py:106-153).
  *
  * Split of work, Spark-first:
  *   - DRIVER parses the TIFF header + IFD chain + OME-XML — a handful of
  *     KB-sized random reads regardless of file size — yielding a strip
  *     catalog: (plane index → t,c,z, offset, byteCount).
  *   - EXECUTORS fetch and decode pixel strips in parallel via
  *     `spark.createDataset(catalog).mapPartitions` + Hadoop FileSystem
  *     positioned reads (file:, hdfs:, s3a: all work), emitting canonical
  *     PlaneRow records. Scene/T/C/Z selection prunes catalog rows before
  *     any pixel byte is read — the dask-graph slicing analog.
  *
  * Plane→(t,c,z) assignment follows the OME DimensionOrder attribute;
  * plain TIFFs (no OME-XML) read as one scene with planes stacked on Z,
  * matching the reference's tiff fallback behavior. Raw OME-XML is
  * preserved as SceneMeta.rawMetadata (M9).
  */
final class OmeTiffReader(spark: SparkSession, path: String) extends BioReader {

  /** One plane's strip locations (plane = one IFD). */
  private case class PlaneRef(sceneIdx: Int, t: Int, c: Int, z: Int,
      h: Int, w: Int, bits: Int, sampleFormat: Int,
      offsets: Seq[Long], counts: Seq[Long])

  private case class Parsed(order: ByteOrder, scenes: Seq[SceneMeta],
      planes: Seq[Seq[PlaneRef]], littleEndian: Boolean)

  private lazy val parsed: Parsed = {
    val fs = FileSystem.get(new Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(path))
    try {
      def read(off: Long, len: Int): Array[Byte] = {
        val buf = new Array[Byte](len)
        in.readFully(off, buf)
        buf
      }
      val (order, ifds) = TiffFormat.parseIfds(read)
      if (ifds.isEmpty)
        throw new UnsupportedFileFormatError(s"'$path' has no TIFF IFDs")
      ifds.find(_.compression != 1).foreach(i =>
        throw new UnsupportedFileFormatError(
          s"'$path' uses TIFF compression ${i.compression}; only " +
            "uncompressed strips are supported"))

      val omeOpt: Option[OME] = ifds.head.description
        .filter(_.contains("<OME"))
        .flatMap(x => scala.util.Try(OmeXml.fromXml(x)).toOption)

      omeOpt match {
        case Some(ome) if ome.images.nonEmpty =>
          // IFDs are assigned to images sequentially, sizeT*sizeC*sizeZ each
          val counts = ome.images.map(i =>
            (i.pixels.sizeT * i.pixels.sizeC * i.pixels.sizeZ).toInt)
          require(counts.sum <= ifds.length,
            s"OME-XML declares ${counts.sum} planes but file has ${ifds.length} IFDs")
          val starts = counts.scanLeft(0)(_ + _)
          val scenes = ome.images.zipWithIndex.map { case (img, i) =>
            val p = img.pixels
            SceneMeta(
              sceneIdx = i,
              sceneId = img.id,
              dims = Dimensions(Dims.Default,
                Seq(p.sizeT, p.sizeC, p.sizeZ, p.sizeY, p.sizeX)),
              channelNames = p.channels.flatMap(_.name),
              physicalPixelSizes = for {
                z <- p.physicalSizeZ; y <- p.physicalSizeY; x <- p.physicalSizeX
              } yield (z, y, x),
              pixelType = OmeXml.pixelTypeOf.getOrElse(p.pixelType,
                TiffFormat.pixelTypeOf(ifds(starts(i)).sampleFormat,
                  ifds(starts(i)).bits)),
              tilePositions = Seq.empty,
              rawMetadata = ifds.head.description,
              timeInterval = p.timeIncrement)
          }
          val planes = ome.images.zipWithIndex.map { case (img, i) =>
            val p = img.pixels
            val zN = p.sizeZ.toInt; val cN = p.sizeC.toInt
            (0 until counts(i)).map { k =>
              val ifd = ifds(starts(i) + k)
              // DimensionOrder XYZCT: z fastest, then c, then t
              val (t, c, z) = p.dimensionOrder match {
                case "XYZCT" => (k / (zN * cN), (k / zN) % cN, k % zN)
                case "XYZTC" =>
                  val tN = p.sizeT.toInt
                  ((k / zN) % tN, k / (zN * tN), k % zN)
                case "XYCZT" => (k / (zN * cN), k % cN, (k / cN) % zN)
                case "XYCTZ" =>
                  val tN = p.sizeT.toInt
                  ((k / cN) % tN, k % cN, k / (cN * tN))
                case "XYTZC" =>
                  val tN = p.sizeT.toInt
                  (k % tN, k / (tN * zN), (k / tN) % zN)
                case "XYTCZ" =>
                  val tN = p.sizeT.toInt
                  (k % tN, (k / tN) % cN, k / (tN * cN))
                case other => (k / (zN * cN), (k / zN) % cN, k % zN)
              }
              PlaneRef(i, t, c, z, ifd.height, ifd.width, ifd.bits,
                ifd.sampleFormat, ifd.stripOffsets, ifd.stripByteCounts)
            }
          }
          Parsed(order, scenes, planes, order == ByteOrder.LITTLE_ENDIAN)
        case _ =>
          // plain TIFF: one scene, IFDs stacked on Z (reference tiff fallback)
          val h = ifds.head.height; val w = ifds.head.width
          val pt = TiffFormat.pixelTypeOf(ifds.head.sampleFormat, ifds.head.bits)
          val scene = SceneMeta(0, "Image:0",
            Dimensions(Dims.Default, Seq(1L, 1L, ifds.length.toLong, h.toLong, w.toLong)),
            channelNames = Seq.empty, physicalPixelSizes = None,
            pixelType = pt, tilePositions = Seq.empty,
            rawMetadata = ifds.head.description, timeInterval = None)
          val planes = ifds.zipWithIndex.map { case (ifd, z) =>
            PlaneRef(0, 0, 0, z, ifd.height, ifd.width, ifd.bits,
              ifd.sampleFormat, ifd.stripOffsets, ifd.stripByteCounts)
          }
          Parsed(order, Seq(scene), Seq(planes), order == ByteOrder.LITTLE_ENDIAN)
      }
    } finally in.close()
  }

  override def name: String = "OmeTiffReader"
  override def supportedExtensions: Seq[String] =
    Seq(".ome.tiff", ".ome.tif", ".tiff", ".tif")

  override def isSupportedImage(spark: SparkSession, p: String): Boolean =
    try {
      val fs = FileSystem.get(new Path(p).toUri,
        spark.sparkContext.hadoopConfiguration)
      val in = fs.open(new Path(p))
      try {
        val magic = new Array[Byte](4)
        in.readFully(0, magic)
        TiffFormat.isTiff(magic)
      } finally in.close()
    } catch { case _: Throwable => false }

  override def scenes: Seq[String] = parsed.scenes.map(_.sceneId)
  override def sceneMeta(sceneIdx: Int): SceneMeta = parsed.scenes(sceneIdx)

  /** Distributed strip read: the strip catalog parallelizes over
    * executors; each task opens the file once and does positioned reads
    * of only its strips. */
  override def readDelayed(spark: SparkSession, sceneIdx: Int): DataFrame = {
    import spark.implicits._
    val refs = parsed.planes(sceneIdx)
    val sceneId = parsed.scenes(sceneIdx).sceneId
    val little = parsed.littleEndian
    val file = path
    val hconf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val slices = math.min(refs.length,
      spark.sparkContext.defaultParallelism).max(1)
    val rows = spark.createDataset(refs.map(r =>
        (r.sceneIdx, r.t, r.c, r.z, r.h, r.w, r.bits, r.sampleFormat,
          r.offsets, r.counts)))
      .repartition(slices)
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val order =
            if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
          val fs = FileSystem.get(new Path(file).toUri, hconf.value)
          val in = fs.open(new Path(file))
          // the FS cache shares FileSystem objects but does NOT close
          // streams — tie the stream's lifetime to the task
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ =>
              try in.close() catch { case _: Throwable => () }))
          it.map { case (si, t, c, z, h, w, bits, sf, offs, cnts) =>
            val total = cnts.sum.toInt
            val buf = new Array[Byte](total)
            var pos = 0
            offs.zip(cnts).foreach { case (o, n) =>
              in.readFully(o, buf, pos, n.toInt)
              pos += n.toInt
            }
            PlaneRow(si, sceneId, level = 0, m = 0, t = t, c = c, z = z,
              s = 0, y0 = 0, x0 = 0, h = h, w = w,
              pixels = TiffFormat.decodePlane(buf, bits, sf, order))
          }
        }
      }
    rows.toDF()
  }
}

object OmeTiffReader {
  val plugin: PluginEntry = PluginEntry(
    name = "OmeTiffReader",
    extensions = Seq(".ome.tiff", ".ome.tif", ".tiff", ".tif"),
    open = (spark, path, _) => new OmeTiffReader(spark, path))
}
