package graft.sources

import org.apache.spark.sql.types.{DataType, Metadata, MetadataBuilder, StructField, StructType}

/** DEFAULT COLUMN VALUES as metadata-only schema evolution (Iceberg
  * v3 initial/write defaults, Delta's `ALTER TABLE ADD COLUMN ...
  * DEFAULT`): `ADD COLUMN d INT DEFAULT 7` publishes ONE property-only
  * commit — no carrier file, no data rewrite — recording the column's
  * type and constant-folded default SQL in snapshot meta. Every read
  * path then serves the column through Spark's own EXISTENCE-DEFAULT
  * machinery: the requested schema's fields carry
  * `EXISTS_DEFAULT`/`CURRENT_DEFAULT` metadata, the parquet readers
  * fill the value for files that PHYSICALLY lack the column (old
  * files — "initial default"), files written after the add carry real
  * values (the analyzer materializes `CURRENT_DEFAULT` into INSERTs
  * that omit the column — "write default"), and time travel below the
  * add serves absence because the meta key simply isn't in that
  * snapshot. The third metadata-only evolution next to rename/drop
  * (column mapping) and type widening. At 100 TB: adding a column
  * with a backfill value is one manifest write, not a table rewrite. */
private[graft] object LakeDefaults {

  /** Snapshot-meta key prefix; one entry per defaulted column. */
  val Prefix = "graft.default."

  /** Spark's resolver keys ([[org.apache.spark.sql.catalyst.util
    * .ResolveDefaultColumns]]) — EXISTS_DEFAULT backfills missing
    * physical columns at read, CURRENT_DEFAULT fills omitted columns
    * at INSERT analysis. */
  val ExistsKey = "EXISTS_DEFAULT"
  val CurrentKey = "CURRENT_DEFAULT"

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  def metaKey(col: String): String = Prefix + col.toLowerCase

  /** name : type-json : default-sql, each base64 (manifest meta
    * values must stay newline-free; SQL may contain anything). */
  def encode(name: String, dt: DataType, sql: String): String =
    s"${b64(name)}:${b64(dt.json)}:${b64(sql)}"

  /** (original column name, data type, constant default SQL). */
  def fromMeta(meta: Map[String, String])
      : Seq[(String, DataType, String)] =
    meta.toSeq.filter(_._1.startsWith(Prefix)).sortBy(_._1).map {
      case (_, v) =>
        val Array(n, tj, sql) = v.split(":", 3)
        (unb64(n), DataType.fromJson(unb64(tj)), unb64(sql))
    }

  private def withDefault(f: StructField, sql: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(ExistsKey, sql).putString(CurrentKey, sql).build())

  /** Enrich a file-derived schema with the declared defaults: fields
    * already present (files written after the add) gain the resolver
    * metadata; absent fields (no file has the column yet) append. */
  def enrich(schema: StructType,
      defaults: Seq[(String, DataType, String)]): StructType =
    defaults.foldLeft(schema) { case (s, (name, dt, sql)) =>
      s.fields.indexWhere(_.name.equalsIgnoreCase(name)) match {
        case -1 => StructType(s.fields :+
          withDefault(StructField(name, dt, nullable = true), sql))
        case i => StructType(s.fields.updated(i,
          withDefault(s.fields(i), sql)))
      }
    }

  def enrichFromMeta(schema: StructType,
      meta: Map[String, String]): StructType = {
    val d = fromMeta(meta)
    if (d.isEmpty) schema else enrich(schema, d)
  }

  /** Constant-folded SQL text of a connector default (the V2
    * `ColumnDefaultValue`): prefer the user's SQL; fall back to the
    * bound literal rendered through catalyst (exact quoting). */
  def sqlOf(dv: org.apache.spark.sql.connector.catalog.ColumnDefaultValue)
      : String = {
    val lit = dv.getValue
    org.apache.spark.sql.catalyst.expressions
      .Literal(lit.value(), lit.dataType()).sql
  }
}
