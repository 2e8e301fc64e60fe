package graft.sources

import org.apache.spark.sql.types._

/** TYPE WIDENING as snapshot metadata (Delta's type-widening table
  * feature): `ALTER TABLE t ALTER COLUMN k TYPE BIGINT` publishes a
  * METADATA-ONLY commit — zero data bytes move — recording the
  * widened logical type; committed narrow files are served through
  * the wide type by the parquet readers' native upcast (int32→long,
  * float→double — probed supported in this Spark, mixed files
  * included), appends land wide because the table schema IS the wide
  * schema, and time travel to a pre-widen snapshot serves the narrow
  * type because the override lives in that snapshot's meta.
  * Narrowing refuses loudly: committed wide values would not fit.
  * Compaction rewrites everything wide and drops the override.
  *
  * The allowed promotions are the lossless ones the parquet readers
  * implement natively: the integral chain (byte < short < int <
  * long) and float → double. */
object LakeTypeWidening {

  /** Snapshot meta key: `col=bigint;col2=double` (logical names). */
  val Meta = "graft.schema.widen"

  /** Widened logical types by lowercase column name. */
  def fromMeta(meta: Map[String, String]): Map[String, DataType] =
    meta.get(Meta).map(_.split(";").toSeq.flatMap { e =>
      e.split("=", 2) match {
        case Array(c, t) if c.nonEmpty =>
          parseType(t).map(c.toLowerCase -> _)
        case _ => None
      }
    }.toMap).getOrElse(Map.empty)

  def toMeta(overrides: Map[String, DataType]): String =
    overrides.toSeq.sortBy(_._1)
      .map { case (c, t) => s"$c=${t.catalogString}" }.mkString(";")

  private def parseType(s: String): Option[DataType] = s match {
    case "smallint" => Some(ShortType)
    case "int" => Some(IntegerType)
    case "bigint" => Some(LongType)
    case "double" => Some(DoubleType)
    case _ => None
  }

  private val rank: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)

  /** Is `from` → `to` a supported lossless widening? */
  def isWidening(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (f, t) if rank.contains(f) && rank.contains(t) =>
        rank(f) < rank(t)
      case (FloatType, DoubleType) => true
      case _ => false
    }

  /** Apply overrides to a (file-derived, possibly narrow) schema. */
  def widen(schema: StructType,
      overrides: Map[String, DataType]): StructType =
    if (overrides.isEmpty) schema
    else StructType(schema.fields.map { f =>
      overrides.get(f.name.toLowerCase) match {
        // an already-wide file (post-widen append) stays as-is; a
        // narrow one presents the widened logical type
        case Some(t) if f.dataType != t && isWidening(f.dataType, t) =>
          f.copy(dataType = t)
        case _ => f
      }
    })
}
