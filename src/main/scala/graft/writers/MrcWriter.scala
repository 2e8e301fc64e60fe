package graft.writers

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.formats.MrcFormat
import graft.image.BioImage

/** `.mrc` (MRC2014) sink: the CURRENT scene as one single-channel MRC
  * map — sections are Z when the scene has depth (ISPG 1, a volume) and
  * T otherwise (ISPG 0, an image stack), mirroring the reader's
  * MRC2014 semantic split so TYX/ZYX round-trip with their axes intact.
  * The mode is the scene's PixelType narrowed back (int8/int16/uint16/
  * float32; uint8 widens exactly into mode 6) — types MRC cannot hold
  * exactly are rejected loudly. Header stats (DMIN/DMAX/DMEAN/RMS) are
  * computed from the data; the voxel size comes from the scene's
  * physicalPixelSizes (ångström) when present, else 1 Å. Little-endian,
  * NVERSION 20140, machine stamp 0x44 0x44.
  *
  * Channels/samples don't fit MRC's single-valued voxels: scenes with
  * C > 1 or S > 1 are rejected (save channels separately or use
  * OME-TIFF/zarr). Like the other interchange writers the array
  * assembles driver-side; bulk pixel data at scale belongs in the
  * zarr / parquet plane sinks. */
object MrcWriter extends BioWriter {
  override def name: String = "MrcWriter"
  override def supportedExtensions: Seq[String] = Seq(".mrc", ".rec")

  override def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]]): Unit = {
    val saved = img.currentSceneIndex
    try {
      selectScenes.foreach { sel =>
        require(sel.length == 1 && img.scenes.contains(sel.head),
          s"mrc holds exactly one array; got selection $sel")
        img.setScene(sel.head)
      }
      val d = img.dims
      def sz(c: Char): Int =
        d.order.indexOf(c) match { case -1 => 1; case i => d.shape(i).toInt }
      require(sz('C') == 1 && sz('S') == 1,
        s"mrc stores single-channel voxels; scene has C=${sz('C')} " +
          s"S=${sz('S')} — save channels separately or use OME-TIFF/zarr")
      val (nT, nZ, ny, nx) = (sz('T'), sz('Z'), sz('Y'), sz('X'))
      require(nT == 1 || nZ == 1,
        s"mrc has one section axis; scene has both T=$nT and Z=$nZ")
      val nz = nT * nZ
      val mode = MrcFormat.modeOf(img.meta.pixelType)
      val data = img.getImageData("TZYX").array.data
      val bytesPer = MrcFormat.dtypeOf(mode)._2
      // Int overflow guard (mirrors MrcReader): fail with the
      // interchange-size contract, not a wrapped allocate()
      require(data.length.toLong * bytesPer <= Int.MaxValue.toLong,
        s"mrc: scene exceeds the driver-side interchange size; " +
          "use the parquet plane store / zarr for bulk pixel data")
      val buf = ByteBuffer.allocate(data.length * bytesPer)
        .order(ByteOrder.LITTLE_ENDIAN)
      mode match {
        case 0 => data.foreach(v => buf.put(v.toByte))
        case 1 => data.foreach(v => buf.putShort(v.toShort))
        case 6 => data.foreach(v => buf.putShort((v.toLong & 0xffff).toShort))
        case _ => data.foreach { v =>
          // mode 2 is float32; never narrow silently (modeOf contract)
          require(v.toFloat.toDouble == v,
            s"mrc mode 2 cannot hold $v exactly; rescale or quantize " +
              "before saving")
          buf.putFloat(v.toFloat)
        }
      }
      val (dmin, dmax) = (data.min, data.max)
      val dmean = data.sum / data.length
      val rms = math.sqrt(
        data.map(v => (v - dmean) * (v - dmean)).sum / data.length)
      // voxel size (z, y, x) in ångström → cell = voxel ⊙ grid
      val (vz, vy, vx) = img.physicalPixelSizes.getOrElse((1.0, 1.0, 1.0))
      val header = MrcFormat.Header(
        nx = nx, ny = ny, nz = nz, mode = mode,
        mx = nx, my = ny, mz = nz,
        cellX = (vx * nx).toFloat, cellY = (vy * ny).toFloat,
        cellZ = (vz * nz).toFloat,
        mapc = 1, mapr = 2, maps = 3,
        dmin = dmin.toFloat, dmax = dmax.toFloat, dmean = dmean.toFloat,
        ispg = if (nZ > 1) 1 else 0, nsymbt = 0, rms = rms.toFloat,
        nlabl = 1, labels = Seq("graft MRC2014 writer"),
        bigEndian = false)
      val fs = FileSystem.get(new Path(uri).toUri,
        img.spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new Path(uri), true)
      try {
        out.write(MrcFormat.headerBytes(header))
        out.write(buf.array())
      } finally out.close()
    } finally img.setScene(saved)
  }
}
