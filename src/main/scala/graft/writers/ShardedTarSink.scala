package graft.writers

import java.awt.image.BufferedImage

import javax.imageio.ImageIO

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.formats.TarFormat

/** DISTRIBUTED WebDataset shard writer — the scale path of the tar
  * surface ([[TarWriter]] writes one shard driver-side; this writes a
  * FLEET of shards executor-side, which is how a 100 TB multimodal
  * corpus actually lands): the plane table repartitions by range on the
  * sample key so each output shard covers a contiguous key slice, each
  * partition encodes its planes to PNG members + `.txt` sidecars and
  * writes ONE `shard-<partition>.tar` directly from the executor — no
  * pixel ever visits the driver, and shard count scales with
  * parallelism. Each shard reopens through the ordinary TarReader
  * plugin path. */
object ShardedTarSink {

  /** `planes` must carry (t, c, z, h, w, pixels) — plus optionally an
    * `s` band column, which then joins the sample key (a multi-band
    * table without it would emit duplicate member names within a shard
    * and make the reopened scenes ambiguous); sample key =
    * "[s<s>_]t<t>_c<c>_z<z>". Returns the shard directory. */
  def write(planes: DataFrame, outDir: String, nShards: Int): Unit = {
    val hasS = planes.columns.contains("s")
    val sCol = if (hasS) col("s").cast("int") else lit(-1).as("s")
    // Hadoop Configuration is not java-serializable and Spark's
    // SerializableConfiguration wrapper is private[spark]; ship the
    // driver's *resolved* conf (incl. every spark.hadoop.* override —
    // object-store credentials, endpoints, custom fs impls) as a plain
    // Map and rebuild it executor-side, so shards land on the
    // configured filesystem, not the classpath-default one.
    val confMap: Map[String, String] = {
      val hc = planes.sparkSession.sparkContext.hadoopConfiguration
      val it = hc.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    planes
      .select(sCol, col("t").cast("int"), col("c").cast("int"),
        col("z").cast("int"), col("h").cast("int"), col("w").cast("int"),
        col("pixels"))
      .repartitionByRange(nShards, col("s"), col("t"), col("c"), col("z"))
      .sortWithinPartitions(col("s"), col("t"), col("c"), col("z"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val members = Seq.newBuilder[TarFormat.Member]
        var any = false
        rows.foreach { r =>
          any = true
          val (s, t, c, z) =
            (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
          val (h, w) = (r.getInt(4), r.getInt(5))
          val px = r.getSeq[Double](6)
          val key =
            if (s >= 0) s"s${s}_t${t}_c${c}_z$z" else s"t${t}_c${c}_z$z"
          val buf = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
          val raster = buf.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0,
                math.min(255, math.max(0, px(y * w + x).round.toInt)))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          if (!ImageIO.write(buf, "png", bos))
            throw new IllegalStateException("no png encoder available")
          members += TarFormat.Member(s"$key.png", bos.toByteArray)
          members += TarFormat.Member(s"$key.txt", key.getBytes("UTF-8"))
        }
        if (any) {
          val pid = TaskContext.getPartitionId()
          val path = new Path(f"$outDir/shard-$pid%05d.tar")
          val conf = new org.apache.hadoop.conf.Configuration(false)
          confMap.foreach { case (k, v) => conf.set(k, v) }
          val fs = FileSystem.get(path.toUri, conf)
          val out = fs.create(path, true)
          try out.write(TarFormat.build(members.result()))
          finally out.close()
        }
      }
  }
}
