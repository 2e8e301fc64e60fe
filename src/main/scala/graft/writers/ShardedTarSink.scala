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

  /** `planes` must carry (t, c, z, h, w, pixels); sample key =
    * "t<t>_c<c>_z<z>". Returns the shard directory. */
  def write(planes: DataFrame, outDir: String, nShards: Int): Unit = {
    planes
      .select(col("t").cast("int"), col("c").cast("int"),
        col("z").cast("int"), col("h").cast("int"), col("w").cast("int"),
        col("pixels"))
      .repartitionByRange(nShards, col("t"), col("c"), col("z"))
      .sortWithinPartitions(col("t"), col("c"), col("z"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val members = Seq.newBuilder[TarFormat.Member]
        var any = false
        rows.foreach { r =>
          any = true
          val (t, c, z) = (r.getInt(0), r.getInt(1), r.getInt(2))
          val (h, w) = (r.getInt(3), r.getInt(4))
          val px = r.getSeq[Double](5)
          val key = s"t${t}_c${c}_z$z"
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
          // executor-side: a fresh Configuration resolves the scheme's
          // FileSystem from the classpath defaults (Hadoop Configuration
          // is not java-serializable, so it can't ride the closure)
          val fs = FileSystem.get(path.toUri,
            new org.apache.hadoop.conf.Configuration())
          val out = fs.create(path, true)
          try out.write(TarFormat.build(members.result()))
          finally out.close()
        }
      }
  }
}
