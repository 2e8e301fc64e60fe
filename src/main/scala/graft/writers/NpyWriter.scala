package graft.writers

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.formats.NpyFormat
import graft.image.BioImage

/** `.npy` sink: the CURRENT scene's full canonical array (TCZYX, +S when
  * the source carries samples) as one C-order numpy array file — the
  * writer half of the ArrayLike-domain interchange (see NpyReader). The
  * element dtype is the scene's PixelType narrowed back (u1/u2/u4 for
  * the widened unsigned reads), little-endian, so a numpy consumer gets
  * exactly the source dtype. An .npy holds one array: multi-scene
  * selections are rejected like the other single-payload sinks.
  *
  * Like the 2D/GIF sinks this is an interchange writer: the array
  * assembles driver-side (npy is one contiguous buffer with a single
  * header — there is nothing to write distributed); bulk pixel data at
  * scale belongs in the zarr / parquet plane sinks. */
object NpyWriter extends BioWriter {
  override def name: String = "NpyWriter"
  override def supportedExtensions: Seq[String] = Seq(".npy")

  /** Serialize the CURRENT scene as npy bytes (header + little-endian
    * C-order elements, dtype = the scene PixelType narrowed back). */
  private[writers] def sceneBytes(img: BioImage): Array[Byte] = {
    val order = img.dims.order
    val nd = img.getImageData(order)
    val shape = nd.array.shape.map(_.toLong)
    val descr = NpyFormat.descrOf(img.meta.pixelType)
    val data = nd.array.data
    val bytesPer = descr.last.asDigit
    // Int overflow guard (mirrors the readers): past ~268M float64
    // elements data.length * bytesPer wraps and allocate() would throw
    // an opaque error — fail with the interchange-size contract instead.
    require(data.length.toLong * bytesPer <= Int.MaxValue.toLong,
      s"npy: scene exceeds the driver-side interchange size; " +
        "use the parquet plane store / zarr for bulk pixel data")
    val buf = ByteBuffer.allocate(data.length * bytesPer)
      .order(ByteOrder.LITTLE_ENDIAN)
    descr.drop(1) match {
      case "i1" => data.foreach(v => buf.put(v.toByte))
      case "u1" => data.foreach(v => buf.put((v.toLong & 0xff).toByte))
      case "i2" => data.foreach(v => buf.putShort(v.toShort))
      case "u2" => data.foreach(v => buf.putShort((v.toLong & 0xffff).toShort))
      case "i4" => data.foreach(v => buf.putInt(v.toInt))
      case "u4" => data.foreach(v => buf.putInt((v.toLong & 0xffffffffL).toInt))
      case "f4" => data.foreach(v => buf.putFloat(v.toFloat))
      case _    => data.foreach(buf.putDouble)
    }
    val header = NpyFormat.headerBytes(descr, shape)
    val out = new Array[Byte](header.length + buf.capacity())
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(buf.array(), 0, out, header.length, buf.capacity())
    out
  }

  override def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]]): Unit = {
    val saved = img.currentSceneIndex
    try {
      selectScenes.foreach { sel =>
        require(sel.length == 1 && img.scenes.contains(sel.head),
          s"npy holds exactly one array; got selection $sel")
        img.setScene(sel.head)
      }
      val fs = FileSystem.get(new Path(uri).toUri,
        img.spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new Path(uri), true)
      try out.write(sceneBytes(img)) finally out.close()
    } finally img.setScene(saved)
  }
}

/** `.npz` sink: ALL selected scenes as one numpy zip archive, each scene
  * a member named `<scene_id>.npy` — the multi-scene interchange
  * (np.load gives back a dict keyed by scene id). Scene order follows
  * the selection (default: all scenes in order), mirroring
  * BioImage.save's preserved-order contract (bio_image.py:1252-1257).
  * Members are DEFLATED; numpy reads both stored and deflated. */
object NpzWriter extends BioWriter {
  override def name: String = "NpzWriter"
  override def supportedExtensions: Seq[String] = Seq(".npz")

  override def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]]): Unit = {
    val sel = Writers.validateSelection(img, selectScenes)
    val saved = img.currentSceneIndex
    val fs = FileSystem.get(new Path(uri).toUri,
      img.spark.sparkContext.hadoopConfiguration)
    val out = new java.util.zip.ZipOutputStream(fs.create(new Path(uri), true))
    try {
      for (scene <- sel) {
        img.setScene(scene)
        out.putNextEntry(new java.util.zip.ZipEntry(s"$scene.npy"))
        out.write(NpyWriter.sceneBytes(img))
        out.closeEntry()
      }
    } finally {
      out.close()
      img.setScene(saved)
    }
  }
}
