package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Executor-side single-file parquet `InternalRow` writer — the
  * missing piece for a NATIVE DSv2 `StreamingWrite` over a file-backed
  * table: Spark's own streaming file path still rides the V1 `Sink`
  * (FileStreamSink), so a connector exposing
  * `TableCapability.STREAMING_WRITE` has to land parquet itself.
  * This bridge reuses Spark's [[ParquetWriteSupport]] (the exact
  * row-to-parquet encoder every batch write uses — same physical
  * layout, timestamps, rebase handling) under parquet-hadoop's plain
  * `ParquetWriter`, with the handful of session confs its `init`
  * requires pinned at driver time into a serializable Configuration.
  * Lives under the sql package for the `private[sql]` SQLConf access —
  * the [[ColumnBridge]] technique; no other internal API is touched. */
object ParquetRowWriterBridge {

  /** Capture schema + write confs on the DRIVER; the result ships to
    * executors and opens one writer per output file. */
  def prepare(spark: SparkSession, schema: StructType): Prepared = {
    val conf = new Configuration(
      spark.sessionState.newHadoopConf())
    ParquetWriteSupport.setSchema(schema, conf)
    val sql = spark.sessionState.conf
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sql.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sql.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sql.parquetFieldIdWriteEnabled.toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sql.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    new Prepared(new SerializableConfiguration(conf))
  }

  final class Prepared(sc: SerializableConfiguration)
      extends Serializable {
    def open(path: String): ParquetWriter[InternalRow] =
      new RowBuilder(new Path(path), sc.value)
        .withConf(sc.value)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()

    /** The captured session Hadoop conf — task-side cleanup (abort
      * paths) must resolve filesystems with the SAME conf the writer
      * opened them with (`spark.hadoop.*` credentials included), not
      * a bare `new Configuration()`. */
    def hadoopConf: Configuration = sc.value
  }

  private final class RowBuilder(path: Path, conf: Configuration)
      extends ParquetWriter.Builder[InternalRow, RowBuilder](
        HadoopOutputFile.fromPath(path, conf)) {
    override def self(): RowBuilder = this
    override def getWriteSupport(
        conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }
}
