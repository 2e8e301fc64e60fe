package graft.sources

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetTable, ParquetWrite}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-based copy-on-write row-level operation for the lake catalog —
  * the machinery behind SQL `UPDATE` and `MERGE INTO` (and `DELETE`
  * when its condition doesn't translate to the metadata-only path).
  * The rewrite group is a FILE, Delta/Iceberg's copy-on-write shape:
  *
  *  - **Scan side**: Spark's group-based planning hands the command's
  *    target-only conjuncts to [[LakeScanBuilder.pushFilters]] for
  *    GROUP pruning — and group semantics demand the scan then return
  *    EVERY row of each surviving group, so the builder deliberately
  *    does NOT forward those filters into parquet (footer/page pruning
  *    would silently drop unmatched rows of touched files, which the
  *    rewrite must copy forward). Instead it runs its own distributed
  *    phase-1 job — `filter(cond)` aggregated to
  *    `_metadata.file_path` — where parquet pushdown IS safe (only
  *    file identities come back), selects the files that might contain
  *    matches, and scans those in full. A selective UPDATE on a 100 TB
  *    table reads and rewrites the touched sliver, never the table.
  *  - **Write side**: the rewritten rows land through Spark's own V2
  *    parquet write ([[ParquetWrite]]) into a fresh immutable
  *    `files-v<N>-<nonce>/` dir; `commit` then publishes a manifest
  *    listing every UNSELECTED file by reference (byte-identical
  *    paths, zero IO) plus the new files — the same atomic
  *    manifest-rename commit point as every other lake write. The
  *    version was pinned when the operation was created, so a
  *    concurrent committer makes the rename fail LOUDLY (optimistic
  *    concurrency) instead of silently dropping either write.
  *
  * If a statement plans multiple scans over the operation (Spark's
  * subquery-condition rewrites do), the replaced set is the UNION of
  * every scan's selection — a scan that never pruned keeps the whole
  * snapshot in, so the commit can only ever be conservative, never
  * lossy. Prior versions keep serving (time travel); [[VersionedTable
  * .vacuum]] reclaims replaced files after retention.
  */
final class GraftLakeRowLevelOperation(dir: String, cmd: Command,
    schema: StructType) extends RowLevelOperation {

  private def spark: SparkSession = SparkSession.active

  /** Snapshot pinned at operation creation: the statement reads and
    * replaces THIS version, and the commit publishes `pinnedV + 1`. */
  private val pinnedV: Int =
    VersionedTable.latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $dir"))
  private val snapshotFiles: Seq[String] =
    VersionedTable.filesOf(spark, dir, pinnedV)

  private val scans = mutable.Buffer.empty[LakeScanBuilder]

  override def command(): Command = cmd

  override def description(): String =
    s"GraftLakeRowLevel($cmd, $dir @ v$pinnedV)"

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val b = new LakeScanBuilder(dir, snapshotFiles, schema, options)
    scans.synchronized { scans += b }
    b
  }

  /** Files whose groups the statement read — everything the commit
    * must replace. No scans planned (degenerate) → conservative all. */
  private def replacedFiles: Seq[String] = scans.synchronized {
    if (scans.isEmpty) snapshotFiles
    else {
      val sel = scans.flatMap(_.selectedFiles).toSet
      snapshotFiles.filter(sel.contains)
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = {
          val newV = pinnedV + 1
          val dataDir = s"$dir/files-v$newV-" +
            java.util.UUID.randomUUID().toString.take(8)
          val inner = ParquetWrite(Seq(dataDir), "parquet",
            (_: org.apache.spark.sql.types.DataType) => true, info).toBatch
          new BatchWrite {
            override def createBatchWriterFactory(
                p: PhysicalWriteInfo): DataWriterFactory =
              new OpStrippingWriterFactory(
                inner.createBatchWriterFactory(p), info.schema())
            override def useCommitCoordinator(): Boolean =
              inner.useCommitCoordinator()
            override def commit(msgs: Array[WriterCommitMessage]): Unit = {
              inner.commit(msgs)
              val s = spark
              val replaced = replacedFiles.toSet
              val kept = snapshotFiles.filterNot(replaced.contains)
              val fresh = VersionedTable.listDataFiles(s, dir, dataDir)
              VersionedTable.publishVersion(s, dir, newV, kept ++ fresh)
              ()
            }
            override def abort(msgs: Array[WriterCommitMessage]): Unit =
              inner.abort(msgs)
          }
        }
      }
    }
}

/** Adapts a plain file-writer factory to the rows a group-based
  * `ReplaceData` feeds a connector that declared NO metadata
  * attributes: Spark prepends `__row_operation`
  * (`RowDeltaUtils.OPERATION_COLUMN`) to every row and — with no
  * metadata projection — hands the WIDE row straight to the writer
  * (`ReplaceDataExec.writingTask` falls back to the plain task), so
  * the connector strips the op column itself, exactly what the
  * metadata-ful path's `ProjectingInternalRow` would have done.
  * Rows tagged `DELETE_OPERATION` are skipped defensively (group-based
  * plans drop deleted rows before the write; if one ever surfaced,
  * writing it back would resurrect it). */
private final class OpStrippingWriterFactory(
    inner: DataWriterFactory, dataSchema: StructType)
    extends DataWriterFactory {
  import org.apache.spark.sql.catalyst.InternalRow

  override def createWriter(partitionId: Int,
      taskId: Long): org.apache.spark.sql.connector.write.DataWriter[InternalRow] = {
    val w = inner.createWriter(partitionId, taskId)
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      private val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
        dataSchema, 1 to dataSchema.length)
      override def write(row: InternalRow): Unit = {
        if (row.numFields == dataSchema.length) w.write(row)
        else if (row.getInt(0) ==
            org.apache.spark.sql.catalyst.util.RowDeltaUtils.DELETE_OPERATION) {
          // dropped: a delete must not be written back
        } else { proj.project(row); w.write(proj) }
      }
      override def commit(): WriterCommitMessage = w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
    }
  }
}

/** Scan builder whose filter pushdown prunes GROUPS (files), never
  * rows — see [[GraftLakeRowLevelOperation]]. Starts conservative
  * (whole snapshot selected) and narrows only when the phase-1 job
  * proves files match-free. */
final class LakeScanBuilder(dir: String, allFiles: Seq[String],
    schema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {

  private def spark: SparkSession = SparkSession.active

  @volatile private var selected: Seq[String] = allFiles
  private var pruningFilters: Array[Filter] = Array.empty

  def selectedFiles: Seq[String] = selected

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val conds = filters.toSeq.flatMap(f =>
      GraftLakeTable.toColumn(f).map(c => (f, c)))
    if (conds.nonEmpty && allFiles.nonEmpty) {
      try {
        val cond = conds.map(_._2).reduce(_ && _)
        val touched = spark.read.option("mergeSchema", "true")
          .parquet(allFiles: _*)
          .filter(cond)
          .select(col("_metadata.file_path"))
          .distinct().collect()
          .map(r => new Path(r.getString(0)).toString).toSet
        selected = allFiles.filter(p => touched(new Path(p).toString))
        pruningFilters = conds.map(_._1).toArray
      } catch {
        case NonFatal(_) => selected = allFiles // conservative: no prune
      }
    }
    // EVERYTHING is residual: group-based rewrites keep the command
    // condition in their projection/join, and this scan must emit all
    // rows of selected files — claiming filters as handled here would
    // be the row-loss bug the class doc describes.
    filters
  }

  /** Reported for EXPLAIN visibility: the conjuncts used for group
    * pruning (still re-evaluated by the rewrite plan above the scan). */
  override def pushedFilters(): Array[Filter] = pruningFilters

  override def build(): Scan =
    ParquetTable("lake_rewrite_scan", spark,
      new CaseInsensitiveStringMap(java.util.Collections.singletonMap(
        "mergeSchema", "true")),
      selected, Some(schema), classOf[ParquetFileFormat])
      .newScanBuilder(options).build()
}
