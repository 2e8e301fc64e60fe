package graft.writers

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.formats.AviFormat
import graft.image.{BioImage, Sel}

/** Uncompressed-AVI T-axis movie sink — the video-CONTAINER member of
  * the TimeSeriesWriter family ([[TimeSeriesWriter]] covers .gif;
  * .mp4/.mkv require external codecs and stay out of a zero-dependency
  * build, but raw-DIB RIFF/AVI is pure container layout): the CURRENT
  * scene's T frames (C=0, Z=0) write in order as BI_RGB 24-bit frames.
  * Gray writes r=g=b and ROUNDTRIPS EXACTLY for 8-bit values; S=3
  * writes RGB exactly (no palette quantization — unlike GIF, AVI's
  * raw frames are lossless). Frame rate derives from the scene's
  * time_interval metadata when present (1/Δt, default 25).
  *
  * Like GIF/PNG this is an interchange sink: frames assemble
  * driver-side; bulk time-series data at scale belongs in the parquet
  * plane store or zarr. */
object AviWriter extends BioWriter {
  override def name: String = "AviWriter"
  override def supportedExtensions: Seq[String] = Seq(".avi")

  override def save(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]]): Unit = {
    val saved = img.currentSceneIndex
    try saveCurrent(img, uri, selectScenes)
    finally img.setScene(saved)
  }

  private def saveCurrent(img: BioImage, uri: String,
      selectScenes: Option[Seq[String]]): Unit = {
    selectScenes.foreach { sel =>
      require(sel.length == 1 && img.scenes.contains(sel.head),
        s"AVI holds exactly one scene's T series; got selection $sel")
      img.setScene(sel.head)
    }
    val d = img.dims
    val nT = if (d.order.contains('T')) d('T').toInt else 1
    val h = d('Y').toInt
    val w = d('X').toInt
    val nS = if (d.order.contains('S')) d('S').toInt else 1
    require(nS == 1 || nS == 3,
      s"AVI supports 1 (gray) or 3 (RGB) samples, got S=$nS")
    val fps = img.meta.timeInterval
      .filter(_ > 0).map(dt => math.max(1, math.round(1.0 / dt).toInt))
      .getOrElse(25)
    val frames = (0 until nT).map { t =>
      val reduce = d.order.filter(c => !"YXS".contains(c))
        .map(c => c -> (Sel.Index(if (c == 'T') t else 0): Sel)).toMap
      val nd =
        if (nS == 3) img.getImageData("YXS", reduce)
        else img.getImageData("YX", reduce)
      val out = new Array[Int](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var s = 0
          while (s < 3) {
            val raw = if (nS == 3) nd.array(y, x, s) else nd.array(y, x)
            out((y * w + x) * 3 + s) = raw.round.toInt
            s += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }
    val bytes = AviFormat.build(AviFormat.Video(w, h, fps, frames))
    val fs = FileSystem.get(new Path(uri).toUri,
      img.spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(uri), true)
    try out.write(bytes)
    finally out.close()
  }
}
