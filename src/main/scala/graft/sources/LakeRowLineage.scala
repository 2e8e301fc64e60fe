package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** ROW LINEAGE (Iceberg v3 row lineage / Delta row tracking): stable
  * per-row identity that survives compaction and row-level rewrites,
  * served as two METADATA columns —
  *
  *  - `_row_id` (BIGINT): assigned monotonically at commit with ZERO
  *    data IO — the manifest records each data file's
  *    `firstRowId` ([[LakeFileStats.FileStats.firstRowId]], Iceberg's
  *    `first_row_id` inheritance) and a row's id is
  *    `firstRowId + position` until a rewrite MATERIALIZES it into
  *    the physical `__graft_row_id` column, after which the column
  *    value wins. Fresh rows (inserts, MERGE reinserts) read null
  *    from the materialized column and fall back to the NEW file's
  *    manifest base — fresh ids, no coordination.
  *  - `_last_updated_version` (INT): the commit that last wrote the
  *    row — file birth version until materialized
  *    (`__graft_last_upd`); Spark's row-level machinery NULLIFIES it
  *    on UPDATE (`MetadataColumn.PRESERVE_ON_UPDATE = false` →
  *    [[org.apache.spark.sql.catalyst.analysis.RewriteRowLevelCommand]]
  *    nullifyMetadataOnUpdate), so an updated row re-inherits the
  *    replacement file's birth = the update's commit version, while
  *    copied rows carry their materialized value through.
  *
  * Why it matters at 100 TB: a downstream MERGE consuming a change
  * feed needs an idempotency key that survives the upstream table's
  * own maintenance — row ids give exactly-once apply across
  * compactions that rewrite every physical file.
  *
  * Scale shape: assignment is manifest arithmetic (no data read, no
  * coordination — each commit claims a contiguous id range from the
  * `graft.rowid.next` watermark); serving is per-partition constants
  * plus a row counter (the [[GraftLakeDvScan]] whole-file-partition
  * discipline); preservation piggybacks on rewrites the table was
  * doing anyway (the lineage columns ride the rewritten files).
  * Lineage reads give up parquet predicate pushdown (positions must
  * count every row) but keep FILE-level pruning — static partition
  * claims and manifest blooms drop whole files, which never breaks
  * position counting. */
private[graft] object LakeRowLineage {

  /** Table property that turns lineage on (CREATE or ALTER). */
  val Prop = "graft.row.lineage"
  /** Snapshot-meta high watermark: the next unassigned row id. */
  val NextKey = "graft.rowid.next"
  /** Served metadata column names. */
  val RowIdCol = "_row_id"
  val LastUpdCol = "_last_updated_version"
  /** Physical (hidden) column names rewrites materialize. */
  val PhysRowId = "__graft_row_id"
  val PhysLastUpd = "__graft_last_upd"

  def isInternalCol(name: String): Boolean =
    name.equalsIgnoreCase(PhysRowId) || name.equalsIgnoreCase(PhysLastUpd)

  /** Lineage declared for this table? Reads `_properties` directly
    * through the given FileSystem (callers inside [[VersionedTable
    * .publish]] have no SparkSession) — one tiny metadata read per
    * commit, only reached when the property file exists. */
  def declared(f: FileSystem, dir: String): Boolean = {
    val p = new Path(s"$dir/_properties")
    if (!f.exists(p)) return false
    val in = f.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.split("\n").exists { l =>
      val i = l.indexOf('=')
      i > 0 && l.take(i).trim == Prop &&
        l.drop(i + 1).trim.equalsIgnoreCase("true")
    }
  }

  /** Commit-time id assignment — MANIFEST ARITHMETIC ONLY. Every data
    * file whose stats lack a `firstRowId` claims the next contiguous
    * range (rowCount wide, deterministic path order); the watermark
    * is monotone even across [[VersionedTable.restore]] (max of the
    * carried meta and every assigned range end). A lineage-enabled
    * file WITHOUT stats refuses loudly: no row count, no range. */
  def assignRowIds(dataFiles: Seq[String],
      stats: Map[String, LakeFileStats.FileStats],
      meta: Map[String, String])
      : (Map[String, LakeFileStats.FileStats], Map[String, String]) = {
    val carriedNext = meta.get(NextKey).map(_.toLong).getOrElse(0L)
    val assignedMax = dataFiles.flatMap(p =>
      stats.get(p).flatMap(s => s.firstRowId.map(_ + s.rowCount)))
      .foldLeft(0L)(math.max)
    var next = math.max(carriedNext, assignedMax)
    val needing = dataFiles
      .filter(p => stats.get(p).forall(_.firstRowId.isEmpty)).sorted
    needing.foreach { p =>
      if (!stats.contains(p)) throw new IllegalStateException(
        s"row lineage needs per-file row counts, but $p has no " +
          "manifest stats (unreadable footer?)")
    }
    val assigned = needing.map { p =>
      val fs0 = stats(p)
      val base = next
      next += fs0.rowCount
      p -> fs0.copy(firstRowId = Some(base))
    }
    (stats ++ assigned, meta + (NextKey -> next.toString))
  }

  /** Per-file serving info, resolved at plan time from the manifest:
    * id base (-1 = never assigned, serves null) and birth version. */
  final case class FileLineage(base: Long, birth: Int)
      extends Serializable

  def perFile(snap: VersionedTable.Snapshot): Map[String, FileLineage] =
    snap.dataFiles.map { p =>
      new Path(p).toString -> FileLineage(
        snap.stats.get(p).flatMap(_.firstRowId).getOrElse(-1L),
        LakePartitioning.fileVersionOfPath(p).getOrElse(0))
    }.toMap

  /** DataFrame-side lineage materialization for FACADE rewrites
    * (compact, COW delete survivors): given a raw tagged scan that
    * still exposes `_metadata`, append the PHYSICAL lineage columns
    * computed exactly like the scan serves them — materialized value
    * if present, manifest base + row position / birth version
    * otherwise. The per-file map is manifest-sized and broadcasts. */
  def materializeCols(spark: SparkSession,
      raw: org.apache.spark.sql.DataFrame,
      info: Map[String, FileLineage]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, when}
    import spark.implicits._
    val m = info.toSeq.map { case (p, fl) => (p, fl.base, fl.birth) }
      .toDF("__lin_path", "__lin_base", "__lin_birth")
    val hasRid = raw.columns.exists(_.equalsIgnoreCase(PhysRowId))
    val hasLu = raw.columns.exists(_.equalsIgnoreCase(PhysLastUpd))
    val joined = raw
      .withColumn("__lin_fp", col("_metadata.file_path"))
      .withColumn("__lin_ri", col("_metadata.row_index"))
      .join(broadcast(m), col("__lin_fp") === col("__lin_path"), "left")
    val rid = coalesce(
      (if (hasRid) Seq(col(PhysRowId)) else Seq.empty) :+
        when(col("__lin_base") >= 0L, col("__lin_base") + col("__lin_ri")): _*)
    val lu = coalesce(
      (if (hasLu) Seq(col(PhysLastUpd)) else Seq.empty) :+
        col("__lin_birth"): _*)
    joined
      .withColumn(PhysRowId, rid.cast(LongType))
      .withColumn(PhysLastUpd, lu.cast(IntegerType))
      .drop("__lin_fp", "__lin_ri", "__lin_path", "__lin_base",
        "__lin_birth")
  }
}

/** Scan serving the lineage metadata columns (and `_file`): the
  * delegate's splits re-plan to ONE WHOLE FILE per partition with no
  * parquet predicate pushdown (the [[GraftLakeDvScan]] discipline —
  * a running counter IS the row position), each partition carries its
  * file's (base, birth) constants, and the reader appends
  * `_row_id` / `_last_updated_version` / `_file` per row —
  * materialized physical value when non-null, manifest arithmetic
  * otherwise. `keep` (static partition/bloom prune survivors) drops
  * whole files — file-granular pruning composes with position
  * counting; row-granular pushdown cannot and stays post-scan. */
final class LakeLineageScan(inner: Scan,
    output: StructType,
    innerOutput: StructType,
    info: Map[String, LakeRowLineage.FileLineage],
    keep: Option[Set[String]] = None) extends Scan {

  override def readSchema(): StructType = output

  override def description(): String =
    inner.description() + ", MetadataCols: row lineage"

  override def toBatch: Batch = {
    val ib = inner.toBatch
    new Batch {
      override def planInputPartitions(): Array[InputPartition] = {
        val files = ib.planInputPartitions().toSeq.flatMap {
          case fp: FilePartition => fp.files
          case other => throw new IllegalStateException(
            s"unexpected non-file partition $other under lineage scan")
        }
        files
          .groupBy(_.filePath.toString).toSeq.sortBy(_._1)
          .filter { case (p, _) =>
            keep.forall(_.contains(
              new org.apache.hadoop.fs.Path(p).toString))
          }
          .zipWithIndex
          .map { case ((path, splits), i) =>
            val whole = splits.head.copy(start = 0L,
              length = splits.head.fileSize)
            val decoded = splits.head.filePath.toPath.toString
            val fl = info.getOrElse(
              new org.apache.hadoop.fs.Path(path).toString,
              LakeRowLineage.FileLineage(-1L, 0))
            new LineagePartition(FilePartition(i, Array(whole)),
              decoded, fl.base, fl.birth): InputPartition
          }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory = {
        // requested-name → joined-row ordinal: inner columns first,
        // then [rowId, lastUpd, file] appended by the reader
        val n = innerOutput.length
        val ords = output.fields.map { f =>
          if (f.name.equalsIgnoreCase(LakeRowLineage.RowIdCol)) n
          else if (f.name.equalsIgnoreCase(LakeRowLineage.LastUpdCol))
            n + 1
          else if (f.name.equalsIgnoreCase("_file")) n + 2
          else {
            val i = innerOutput.fieldNames
              .indexWhere(_.equalsIgnoreCase(f.name))
            if (i < 0) throw new IllegalStateException(
              s"lineage scan: requested column '${f.name}' missing " +
                "from the inner read")
            i
          }
        }
        val matRid = innerOutput.fieldNames
          .indexWhere(_.equalsIgnoreCase(LakeRowLineage.PhysRowId))
        val matLu = innerOutput.fieldNames
          .indexWhere(_.equalsIgnoreCase(LakeRowLineage.PhysLastUpd))
        new LineageReaderFactory(ib.createReaderFactory(), output,
          ords, matRid, matLu)
      }
    }
  }
}

private final class LineagePartition(val file: FilePartition,
    val path: String, val base: Long, val birth: Int)
    extends InputPartition {
  override def preferredLocations(): Array[String] =
    file.preferredLocations()
}

private final class LineageReaderFactory(inner: PartitionReaderFactory,
    output: StructType, ords: Array[Int], matRid: Int, matLu: Int)
    extends PartitionReaderFactory {

  // per-row appended values; never hand out raw columnar batches
  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    val lp = p.asInstanceOf[LineagePartition]
    val r = inner.createReader(lp.file)
    val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
    val tail = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(3)
    tail.update(2,
      org.apache.spark.unsafe.types.UTF8String.fromString(lp.path))
    val proj =
      org.apache.spark.sql.catalyst.ProjectingInternalRow(output,
        ords.toIndexedSeq)
    new PartitionReader[InternalRow] {
      private var pos = -1L

      override def next(): Boolean = {
        if (!r.next()) return false
        pos += 1
        true
      }

      override def get(): InternalRow = {
        val row = r.get()
        val rid: Any =
          if (matRid >= 0 && !row.isNullAt(matRid)) row.getLong(matRid)
          else if (lp.base >= 0L) lp.base + pos
          else null
        val lu: Any =
          if (matLu >= 0 && !row.isNullAt(matLu)) row.getInt(matLu)
          else lp.birth
        tail.update(0, rid)
        tail.update(1, lu)
        proj.project(joined(row, tail))
        proj
      }

      override def close(): Unit = r.close()
    }
  }
}

/** Write-side lineage materialization for ROW-LEVEL rewrites: wraps
  * the replacement-file writer so Spark's metadata-ful `ReplaceData`
  * path ([[org.apache.spark.sql.execution.datasources.v2
  * .DataAndMetadataWritingSparkTask]] — `DataWriter.write(meta, row)`)
  * lands each row WITH its carried lineage as the trailing physical
  * columns. The metadata row is `[_row_id, _last_updated_version]`
  * in [[GraftLakeRowLevelOperation.requiredMetadataAttributes]]
  * order; Spark already nullified what must not carry (update →
  * null `_last_updated_version`, reinsert → null both), and nulls
  * simply materialize as nulls — the read side's manifest fallback
  * serves fresh values for them. */
private[sources] final class LineageWriterFactory(
    inner: DataWriterFactory) extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    val w = inner.createWriter(partitionId, taskId)
    new DataWriter[InternalRow] {
      private val joined =
        new org.apache.spark.sql.catalyst.expressions.JoinedRow
      private val tail = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(2)

      override def write(meta: InternalRow, row: InternalRow): Unit = {
        tail.update(0,
          if (meta.isNullAt(0)) null else meta.getLong(0))
        tail.update(1,
          if (meta.isNullAt(1)) null else meta.getInt(1))
        w.write(joined(row, tail))
      }

      override def write(row: InternalRow): Unit = {
        tail.update(0, null)
        tail.update(1, null)
        w.write(joined(row, tail))
      }

      override def commit(): WriterCommitMessage = w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
    }
  }
}
