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

  override def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]]): Unit = {
    val saved = img.currentSceneIndex
    try {
      selectScenes.foreach { sel =>
        require(sel.length == 1 && img.scenes.contains(sel.head),
          s"npy holds exactly one array; got selection $sel")
        img.setScene(sel.head)
      }
      val order = img.dims.order
      val nd = img.getImageData(order)
      val shape = nd.array.shape.map(_.toLong)
      val descr = NpyFormat.descrOf(img.meta.pixelType)
      val data = nd.array.data
      val bytesPer = descr.last.asDigit
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
      val fs = FileSystem.get(new Path(uri).toUri,
        img.spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new Path(uri), true)
      try {
        out.write(NpyFormat.headerBytes(descr, shape))
        out.write(buf.array())
      } finally out.close()
    } finally img.setScene(saved)
  }
}
