package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataTypes, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Lifecycle maintenance as SQL PROCEDURES — Iceberg's
  * `CALL catalog.system.rewrite_data_files` shape on Spark 4's native
  * `ProcedureCatalog`/`BoundProcedure` stack, so table upkeep is
  * reachable from plain SQL like every other lake operation:
  *
  *  - `CALL <cat>.system.compact(table => 'ns.t', target_files => 4)`
  *    rewrites the current snapshot into N files (declared clustering
  *    applies — compaction is exactly when a table re-earns its
  *    layout) and publishes it as a new version; returns (version,
  *    data_files).
  *  - `CALL <cat>.system.vacuum(table => 'ns.t', keep => 2)` deletes
  *    files unreachable from the last `keep` versions past the
  *    concurrent-commit grace window; returns (deleted_files).
  *
  * Both return their result through a [[LocalScan]] — driver-computed
  * metadata rows, no cluster job beyond the rewrite itself. Named and
  * positional arguments, `SHOW PROCEDURES` and `DESCRIBE PROCEDURE`
  * all ride Spark's analyzer, not custom parsing. */
private[sources] object GraftLakeProcedures {

  val names: Seq[String] = Seq("compact", "vacuum", "restore", "clone",
    "create_tag", "drop_tag", "create_branch", "drop_branch",
    "fast_forward", "convert_deletes")

  /** `resolveDir` maps a procedure's table argument ('t' or 'ns.t',
    * catalog-relative) to the table directory, failing loudly on a
    * non-table; `resolveNewDir` resolves a CLONE TARGET, which must
    * NOT already be a table. */
  def load(name: String, resolveDir: String => String,
      resolveNewDir: String => String): Option[UnboundProcedure] =
    name.toLowerCase match {
      case "compact" => Some(CompactProc(resolveDir))
      case "vacuum" => Some(VacuumProc(resolveDir))
      case "restore" => Some(RestoreProc(resolveDir))
      case "clone" => Some(CloneProc(resolveDir, resolveNewDir))
      case "create_tag" => Some(CreateTagProc(resolveDir))
      case "drop_tag" => Some(DropTagProc(resolveDir))
      case "create_branch" => Some(CreateBranchProc(resolveDir))
      case "drop_branch" => Some(DropBranchProc(resolveDir))
      case "fast_forward" => Some(FastForwardProc(resolveDir))
      case "convert_deletes" => Some(ConvertDeletesProc(resolveDir))
      case _ => None
    }

  private def spark: SparkSession = SparkSession.active

  private final case class ResultScan(schema: StructType,
      row: InternalRow) extends LocalScan {
    override def rows(): Array[InternalRow] = Array(row)
    override def readSchema(): StructType = schema
  }

  private def one(s: Scan): java.util.Iterator[Scan] =
    java.util.Collections.singletonList(s).iterator()

  private final case class CompactProc(resolveDir: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "compact(table, target_files, target_size_mb, order_by): " +
        "rewrite the current snapshot into target_files files and " +
        "publish it as a new version; order_by overrides the " +
        "declared clustering for this rewrite (OPTIMIZE ZORDER BY — " +
        "same term syntax, e.g. 'k' or 'morton2(a,b)')"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", DataTypes.StringType).build(),
      ProcedureParameter.in("target_files", DataTypes.IntegerType)
        .defaultValue("1").build(),
      // the 100 TB mode: size files, not counts; >0 wins over
      // target_files
      ProcedureParameter.in("target_size_mb", DataTypes.LongType)
        .defaultValue("0").build(),
      ProcedureParameter.in("order_by", DataTypes.StringType)
        .defaultValue("''").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = resolveDir(input.getUTF8String(0).toString)
      val sizeMb = input.getLong(2)
      val orderBy = Option(input.getUTF8String(3))
        .map(_.toString.trim).filter(_.nonEmpty)
      val v =
        if (sizeMb > 0)
          VersionedTable.compactToSize(spark, dir, sizeMb * 1024 * 1024)
        else VersionedTable.compact(spark, dir,
          targetFiles = input.getInt(1), orderBy = orderBy)
      val files = VersionedTable.filesOf(spark, dir, v).size
      one(ResultScan(
        StructType(Seq(StructField("version", DataTypes.IntegerType),
          StructField("data_files", DataTypes.IntegerType))),
        InternalRow(v, files)))
    }
  }

  private final case class ConvertDeletesProc(
      resolveDir: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "convert_deletes"
    override def description(): String =
      "convert_deletes(table): fold outstanding equality-delete " +
        "files into one positional delete file (compressed-bitmap " +
        "masks) without rewriting any data file — the maintenance " +
        "that keeps a busy CDC table's delete chain scan-cheap " +
        "between full compactions"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", DataTypes.StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = resolveDir(input.getUTF8String(0).toString)
      val before = VersionedTable.latestVersion(spark, dir)
        .map(v => VersionedTable.snapshotOf(spark, dir, v)
          .deleteFiles.count(VersionedTable.isEqualityDelete))
        .getOrElse(0)
      val v = VersionedTable.convertEqDeletes(spark, dir)
      one(ResultScan(
        StructType(Seq(StructField("version", DataTypes.IntegerType),
          StructField("folded_eq_files", DataTypes.IntegerType))),
        InternalRow(v, before)))
    }
  }

  private final case class RestoreProc(resolveDir: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "restore"
    override def description(): String =
      "restore(table, version): publish an old snapshot's file list " +
        "as a NEW version (zero-copy rollback; history preserved)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", DataTypes.StringType).build(),
      ProcedureParameter.in("version", DataTypes.IntegerType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = resolveDir(input.getUTF8String(0).toString)
      val target = input.getInt(1)
      val v = VersionedTable.restore(spark, dir, target)
      one(ResultScan(
        StructType(Seq(StructField("version", DataTypes.IntegerType),
          StructField("restored_version", DataTypes.IntegerType))),
        InternalRow(v, target)))
    }
  }

  private final case class CloneProc(resolveDir: String => String,
      resolveNewDir: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "clone"
    override def description(): String =
      "clone(source, target): zero-copy shallow clone — the target's " +
        "first version references the source's current snapshot files " +
        "(table properties travel); the fork then diverges independently"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("source", DataTypes.StringType).build(),
      ProcedureParameter.in("target", DataTypes.StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val src = resolveDir(input.getUTF8String(0).toString)
      val dst = resolveNewDir(input.getUTF8String(1).toString)
      val v = VersionedTable.shallowClone(spark, src, dst)
      // clustering / delete-mode declarations travel with the fork
      GraftLakeTable.writeProperties(spark, dst,
        GraftLakeTable.readProperties(spark, src))
      val files = VersionedTable.filesOf(spark, dst, v).size
      one(ResultScan(
        StructType(Seq(StructField("version", DataTypes.IntegerType),
          StructField("data_files", DataTypes.IntegerType))),
        InternalRow(v, files)))
    }
  }

  private final case class CreateTagProc(resolveDir: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "create_tag"
    override def description(): String =
      "create_tag(table, tag, version): pin a snapshot under an " +
        "immutable name — addressable as VERSION AS OF '<tag>' and " +
        "retained by vacuum regardless of the keep horizon; " +
        "version < 0 (the default) tags the latest"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", DataTypes.StringType).build(),
      ProcedureParameter.in("tag", DataTypes.StringType).build(),
      ProcedureParameter.in("version", DataTypes.IntegerType)
        .defaultValue("-1").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = resolveDir(input.getUTF8String(0).toString)
      val tag = input.getUTF8String(1).toString
      val v = input.getInt(2) match {
        case neg if neg < 0 =>
          // the HEAD — "tag what the table currently is", never a
          // branch-staged manifest that happens to be newest
          VersionedTable.headVersion(spark, dir).getOrElse(
            throw new IllegalArgumentException(
              s"no committed version to tag at $dir"))
        case explicit => explicit
      }
      VersionedTable.createTag(spark, dir, tag, v)
      one(ResultScan(
        StructType(Seq(StructField("tag", DataTypes.StringType),
          StructField("version", DataTypes.IntegerType))),
        InternalRow(UTF8String.fromString(tag), v)))
    }
  }

  private final case class DropTagProc(resolveDir: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "drop_tag"
    override def description(): String =
      "drop_tag(table, tag): remove a named snapshot pin; the " +
        "snapshot then ages out under the normal vacuum horizon"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", DataTypes.StringType).build(),
      ProcedureParameter.in("tag", DataTypes.StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = resolveDir(input.getUTF8String(0).toString)
      val tag = input.getUTF8String(1).toString
      val existed = VersionedTable.dropTag(spark, dir, tag)
      one(ResultScan(
        StructType(Seq(StructField("dropped", DataTypes.BooleanType))),
        InternalRow(existed)))
    }
  }

  private final case class CreateBranchProc(resolveDir: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "create_branch"
    override def description(): String =
      "create_branch(table, branch, version): pin a MUTABLE ref for " +
        "write-audit-publish staging; version < 0 (the default) " +
        "branches from the current head"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", DataTypes.StringType).build(),
      ProcedureParameter.in("branch", DataTypes.StringType).build(),
      ProcedureParameter.in("version", DataTypes.IntegerType)
        .defaultValue("-1").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = resolveDir(input.getUTF8String(0).toString)
      val branch = input.getUTF8String(1).toString
      val v = input.getInt(2) match {
        case neg if neg < 0 =>
          VersionedTable.headVersion(spark, dir).getOrElse(
            throw new IllegalArgumentException(
              s"no committed version to branch at $dir"))
        case explicit => explicit
      }
      VersionedTable.createBranch(spark, dir, branch, v)
      one(ResultScan(
        StructType(Seq(StructField("branch", DataTypes.StringType),
          StructField("version", DataTypes.IntegerType))),
        InternalRow(UTF8String.fromString(branch), v)))
    }
  }

  private final case class DropBranchProc(resolveDir: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "drop_branch"
    override def description(): String =
      "drop_branch(table, branch): discard staged work — the " +
        "branch's commits then age out under the normal vacuum horizon"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", DataTypes.StringType).build(),
      ProcedureParameter.in("branch", DataTypes.StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = resolveDir(input.getUTF8String(0).toString)
      val existed = VersionedTable.dropBranch(spark, dir,
        input.getUTF8String(1).toString)
      one(ResultScan(
        StructType(Seq(StructField("dropped", DataTypes.BooleanType))),
        InternalRow(existed)))
    }
  }

  private final case class FastForwardProc(resolveDir: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "fast_forward"
    override def description(): String =
      "fast_forward(table, branch): PUBLISH the audited branch to " +
        "main — re-publishes the branch head's snapshot as the next " +
        "main version by reference (zero data copied)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", DataTypes.StringType).build(),
      ProcedureParameter.in("branch", DataTypes.StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = resolveDir(input.getUTF8String(0).toString)
      val branch = input.getUTF8String(1).toString
      val fromV = VersionedTable.branches(spark, dir).getOrElse(branch,
        throw new IllegalArgumentException(
          s"no branch '$branch' to fast-forward"))
      val v = VersionedTable.fastForward(spark, dir, branch)
      one(ResultScan(
        StructType(Seq(
          StructField("version", DataTypes.IntegerType),
          StructField("from_branch_version", DataTypes.IntegerType))),
        InternalRow(v, fromV)))
    }
  }

  private final case class VacuumProc(resolveDir: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "vacuum(table, keep, grace_ms, dry_run, retain_ms): delete " +
        "files unreachable from the last `keep` versions, past the " +
        "concurrent-commit grace window; dry_run => true reports the " +
        "reclaimable set without deleting anything; retain_ms > 0 " +
        "additionally keeps every version younger than the window " +
        "(Delta's RETAIN)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", DataTypes.StringType).build(),
      ProcedureParameter.in("keep", DataTypes.IntegerType)
        .defaultValue("1").build(),
      ProcedureParameter.in("grace_ms", DataTypes.LongType)
        .defaultValue(String.valueOf(
          VersionedTable.DefaultVacuumGraceMs)).build(),
      ProcedureParameter.in("dry_run", DataTypes.BooleanType)
        .defaultValue("false").build(),
      ProcedureParameter.in("retain_ms", DataTypes.LongType)
        .defaultValue("0").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = resolveDir(input.getUTF8String(0).toString)
      val plan = VersionedTable.vacuumPlan(spark, dir,
        keep = input.getInt(1), graceMs = input.getLong(2),
        retainMs = input.getLong(4))
      val dryRun = input.getBoolean(3)
      val deleted =
        if (dryRun) plan.reported
        else VersionedTable.vacuumApply(spark, dir, plan)
      one(ResultScan(
        StructType(Seq(
          StructField("deleted_files", DataTypes.IntegerType),
          StructField("reclaimed_bytes", DataTypes.LongType),
          StructField("dry_run", DataTypes.BooleanType),
          StructField("first_deleted", DataTypes.StringType, true))),
        InternalRow(deleted.size, plan.reclaimedBytes, dryRun,
          deleted.sorted.headOption
            .map(UTF8String.fromString).orNull)))
    }
  }
}
