package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog scan for a snapshot carrying MERGE-ON-READ delete files
  * (positional deletion vectors). The V2 parquet stack has no
  * `_metadata.row_index`, so positions are recovered structurally:
  * the delegate scan's partitions are RE-PLANNED to exactly one WHOLE
  * file per partition, and — crucially — no predicate is pushed into
  * parquet (predicate pushdown is the only thing that makes the
  * reader skip rows), so each partition yields every row of its file
  * in file order and a running counter IS the row's position, the
  * same 0-based file position the delete files record. The reader
  * then walks its file's sorted delete positions merge-join style:
  * O(1) per row, no lookup structure per row, masks applied
  * per-partition with zero joins or shuffles — the DV read shape.
  * Filters the optimizer wanted pushed are simply left for the
  * post-scan Filter node (rows are masked first, then filtered — the
  * correct order), and aggregate pushdown is deliberately absent: a
  * footer-count would count masked rows. Column pruning still
  * delegates (dropping columns never drops rows). Compact the table
  * to return to the full pushdown stack — DV chains are a
  * between-compactions state, not a resting state. */
final class GraftLakeDvScanBuilder(table: ParquetTable,
    tableSchema: StructType, deleteFiles: Seq[String],
    options: CaseInsensitiveStringMap,
    totalRows: Option[Long] = None) extends ScanBuilder
    with SupportsPushDownRequiredColumns {

  private def spark: SparkSession = SparkSession.active

  private val inner = table.newScanBuilder(options)

  private val (eqFiles, posFiles) =
    deleteFiles.partition(VersionedTable.isEqualityDelete)

  /** EQUALITY-DELETE key columns must survive column pruning — the
    * reader filters on them — so the inner scan reads requested ∪
    * keys and the built scan projects back down ([[EqDelete]]). */
  private lazy val eqKeyCols: Seq[String] =
    eqFiles.flatMap(f => spark.read.parquet(f).columns).distinct

  private var requested: Option[StructType] = None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    requested = Some(requiredSchema)
    val widened =
      if (eqFiles.isEmpty) requiredSchema
      else {
        val missing = eqKeyCols.filterNot(k =>
          requiredSchema.fieldNames.exists(_.equalsIgnoreCase(k)))
        StructType(requiredSchema.fields ++ missing.flatMap(k =>
          tableSchema.fields.find(_.name.equalsIgnoreCase(k))))
      }
    inner match {
      case p: SupportsPushDownRequiredColumns => p.pruneColumns(widened)
      case _ =>
    }
  }

  override def build(): Scan = {
    // load the masks once, driver-side; deleted-rows/keys-sized by
    // construction (or the table is due a compact)
    val positions: Map[String, Array[Long]] =
      if (posFiles.isEmpty) Map.empty
      else spark.read
        .parquet(posFiles: _*)
        .collect()
        .groupBy(_.getString(0))
        .map { case (f, rows) =>
          f -> rows.map(_.getLong(1)).distinct.sorted
        }
    // equality deletes: each file's parquet schema IS its key set;
    // keys load in INTERNAL form (UTF8String / epoch ints) so the
    // reader compares without conversion. Applicability is by
    // sequence: a delete born at version D masks files born BEFORE D.
    val eqDeletes: Seq[EqDelete] = eqFiles.map { f =>
      val df = spark.read.parquet(f).distinct()
      val delV = LakePartitioning.fileVersionOfPath(f).getOrElse(
        throw new IllegalStateException(
          s"equality-delete file $f carries no version in its path"))
      val types = df.schema.fields.map(_.dataType)
      val keys = df.queryExecution.toRdd.map(_.copy()).collect()
        .map(r => types.indices.map(i => r.get(i, types(i))).toVector)
        .toSet
      EqDelete(delV, df.columns.toSeq, types.toSeq, keys)
    }
    new GraftLakeDvScan(inner.build(), positions, totalRows,
      eqDeletes, requested.filter(_ => eqFiles.nonEmpty))
  }
}

/** One equality-delete file, driver-loaded: masks every key tuple in
  * `keys` on data files born before `version`. */
private[sources] final case class EqDelete(version: Int,
    cols: Seq[String],
    types: Seq[org.apache.spark.sql.types.DataType],
    keys: Set[Vector[Any]]) extends Serializable

final class GraftLakeDvScan(inner: Scan,
    deletes: Map[String, Array[Long]],
    totalRows: Option[Long] = None,
    eqDeletes: Seq[EqDelete] = Seq.empty,
    projectTo: Option[StructType] = None) extends Scan
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType =
    projectTo.getOrElse(inner.readSchema())

  override def description(): String =
    s"GraftLakeDvScan(masked=${deletes.valuesIterator.map(_.length).sum}" +
      (if (eqDeletes.isEmpty) ")"
       else s", eqKeys=${eqDeletes.map(_.keys.size).sum})")

  /** LIVE-row statistics for the planner, from MANIFEST row counts
    * minus the masked rows — so join-side decisions (broadcast vs
    * shuffle, CBO reorder) see the table the query will actually
    * read: a DV table that masked 90% of its rows should broadcast
    * like the small table it now is. The delegate's byte estimate is
    * scaled proportionally; without a manifest total (pre-stats
    * table) the delegate's estimate passes through unchanged. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val masked = deletes.valuesIterator.map(_.length.toLong).sum
    val baseBytes: java.util.OptionalLong = inner match {
      case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
        s.estimateStatistics().sizeInBytes()
      case _ => java.util.OptionalLong.empty()
    }
    val live = totalRows.map(t => math.max(0L, t - masked))
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        (live, totalRows) match {
          case (Some(l), Some(t)) if t > 0 && baseBytes.isPresent =>
            java.util.OptionalLong.of(
              math.max(1L, baseBytes.getAsLong / t * l))
          case _ => baseBytes
        }
      override def numRows(): java.util.OptionalLong =
        live.map(java.util.OptionalLong.of)
          .getOrElse(java.util.OptionalLong.empty())
    }
  }

  override def toBatch: Batch = {
    val ib = inner.toBatch
    new Batch {
      /** One WHOLE file per partition: position = row counter. Each
        * partition carries ONLY its own file's delete positions —
        * resolved here at plan time (the driver already holds the
        * whole map), so the task closure ships a slice proportional
        * to that file's masked rows, not the table's, and the reader
        * never scans other files' positions. */
      override def planInputPartitions(): Array[InputPartition] = {
        val files = ib.planInputPartitions().toSeq.flatMap {
          case fp: FilePartition => fp.files
          case other => throw new IllegalStateException(
            s"unexpected non-file partition $other under DV scan")
        }
        // facade-recorded _metadata.file_path strings and the V2
        // reader's SparkPath normalize through hadoop Path
        val byKey = deletes.map { case (f, ps) =>
          new org.apache.hadoop.fs.Path(f).toString -> ps
        }
        // equality keys resolve to ordinals in the INNER read schema
        // here at plan time; each partition ships only the deletes
        // that APPLY to its file (born before the delete's version)
        val innerSchema = inner.readSchema()
        def ordinal(c: String): Int = {
          val i = innerSchema.fieldNames.indexWhere(_.equalsIgnoreCase(c))
          if (i < 0) throw new IllegalStateException(
            s"equality-delete key '$c' missing from the read schema " +
              innerSchema.fieldNames.mkString("(", ",", ")"))
          i
        }
        val resolved = eqDeletes.map(e =>
          (e.version, e.cols.map(ordinal).toArray, e.types.toArray, e.keys))
        val projection = projectTo.map(p =>
          p.fieldNames.map(ordinal).toSeq)
        files
          .groupBy(_.filePath.toString).toSeq.sortBy(_._1)
          .zipWithIndex
          .map { case ((path, splits), i) =>
            val whole = splits.head.copy(start = 0L,
              length = splits.head.fileSize)
            val key = new org.apache.hadoop.fs.Path(path).toString
            val born = LakePartitioning.fileVersionOfPath(key)
            val applicable = resolved.filter { case (dv, _, _, _) =>
              born.exists(_ < dv)
            }
            new DvInputPartition(FilePartition(i, Array(whole)),
              byKey.getOrElse(key, Array.emptyLongArray),
              applicable, projection): InputPartition
          }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new DvReaderFactory(ib.createReaderFactory(),
          projectTo, inner.readSchema())
    }
  }
}

/** A whole-file partition plus exactly ITS delete positions (sorted)
  * and the equality deletes that apply to its file (each as resolved
  * key ordinals + types + the key-tuple set), plus the output
  * projection when the read widened for equality keys. */
private[sources] final class DvInputPartition(val file: FilePartition,
    val positions: Array[Long],
    val eq: Seq[(Int, Array[Int],
      Array[org.apache.spark.sql.types.DataType], Set[Vector[Any]])] =
      Seq.empty,
    val projection: Option[Seq[Int]] = None) extends InputPartition {
  override def preferredLocations(): Array[String] =
    file.preferredLocations()
}

private final class DvReaderFactory(inner: PartitionReaderFactory,
    projectTo: Option[StructType] = None,
    innerSchema: StructType = new StructType())
    extends PartitionReaderFactory {

  // masking happens row-wise; never hand out raw columnar batches
  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    val dv = p.asInstanceOf[DvInputPartition]
    val r = inner.createReader(dv.file)
    val masked: Array[Long] = dv.positions
    val eqDels = dv.eq
    val projector = (projectTo, dv.projection) match {
      case (Some(schema), Some(ords)) =>
        val pr = org.apache.spark.sql.catalyst.ProjectingInternalRow(
          schema, ords)
        Some(pr)
      case _ => None
    }
    new PartitionReader[InternalRow] {
      private var pos = -1L
      private var di = 0
      private var current: InternalRow = _

      private def eqMasked(row: InternalRow): Boolean =
        eqDels.exists { case (_, ords, types, keys) =>
          val tuple = Vector.tabulate(ords.length)(i =>
            row.get(ords(i), types(i)))
          keys.contains(tuple)
        }

      override def next(): Boolean = {
        while (r.next()) {
          pos += 1
          if (di < masked.length && masked(di) == pos) {
            di += 1 // positionally masked: skip
          } else {
            val row = r.get()
            if (eqDels.isEmpty || !eqMasked(row)) {
              current = projector match {
                case Some(pr) => pr.project(row); pr
                case None => row
              }
              return true
            }
          }
        }
        false
      }

      override def get(): InternalRow = current
      override def close(): Unit = r.close()
    }
  }
}
