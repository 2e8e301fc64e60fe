package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GetJsonObject, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, get_json_object}
import org.apache.spark.sql.types.StringType

/** SHREDDED JSON storage (the parse-once shape of Delta/Iceberg's
  * variant shredding, Spark's own variant-shredding direction): a
  * table declaring `graft.json.shred'='props:$.plan,$.count'` has
  * every commit MATERIALIZE those paths into hidden string columns
  * (`__shred_plan`, `__shred_count`) next to the raw JSON, and a
  * resolution rule rewrites `get_json_object(props, '$.plan')` over
  * that table into the shredded column — served through the metadata-
  * column surface, so the raw string column PRUNES AWAY entirely and
  * min/max stats + predicate pushdown work on the extracted values.
  *
  * Why it matters at 100 TB: q24-style queries parse every row's JSON
  * per query; shredding parses ONCE at ingest, and the per-query cost
  * becomes a plain columnar read of exactly the referenced paths
  * (gate: the shredded plan's ReadSchema does not contain the raw
  * column). Non-declared paths keep parsing the raw string — it is
  * still there, nothing is lost.
  *
  * The rewrite is CORRECTNESS-GATED per table: it fires only when
  * every live data file physically carries the shredded columns
  * (manifest-stats column inventory — zero IO). Files landed by
  * non-shredding writers (row-level rewrites, upserts) degrade the
  * table to raw parsing until compaction re-materializes; answers
  * never change, only the plan does. */
private[graft] object LakeJsonShred {

  /** Table property: `<jsonColumn>:<path>[,<path>...]`. */
  val Prop = "graft.json.shred"

  val ColPrefix = "__shred_"

  def isShredCol(name: String): Boolean =
    name.toLowerCase.startsWith(ColPrefix)

  def shredColName(path: String): String =
    ColPrefix + path.stripPrefix("$.")
      .replaceAll("[^A-Za-z0-9_]", "_").toLowerCase

  /** (source column, declared paths) from table properties. */
  def fromProps(props: java.util.Map[String, String])
      : Option[(String, Seq[String])] =
    Option(props.get(Prop)).map { v =>
      val i = v.indexOf(':')
      require(i > 0, s"$Prop must be '<column>:<path>,<path>...' " +
        s"got '$v'")
      val paths = v.drop(i + 1).split(",").toSeq.map(_.trim)
        .filter(_.nonEmpty)
      require(paths.nonEmpty && paths.forall(_.startsWith("$.")),
        s"$Prop paths must start with '$$.', got '$v'")
      (v.take(i).trim, paths)
    }

  /** Ingest-side materialization: append one string column per
    * declared path (parse-once — this is the only place the JSON is
    * ever parsed for declared paths on the steady-state read path). */
  def shred(df: DataFrame, src: String, paths: Seq[String]): DataFrame =
    paths.foldLeft(df) { (d, p) =>
      if (d.columns.exists(_.equalsIgnoreCase(shredColName(p)))) d
      else d.withColumn(shredColName(p), get_json_object(col(src), p))
    }

  /** Resolution rule: `get_json_object(<declared col>, '<declared
    * path>')` over a gated lake relation rewrites to the shredded
    * METADATA column. Runs inside the analyzer's resolution fixpoint,
    * so Spark's own AddMetadataColumns then threads the referenced
    * metadata attribute down to the scan. */
  final case class ShredRewrite(
      spark: org.apache.spark.sql.SparkSession) extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan = {
      // per-relation: source attr exprId → (path → shred metadata attr)
      val maps = plan.collect {
        case r: DataSourceV2Relation
            if r.table.isInstanceOf[GraftLakeTable] =>
          val t = r.table.asInstanceOf[GraftLakeTable]
          t.shredServing.flatMap { case (src, paths) =>
            r.output.find(_.name.equalsIgnoreCase(src)).map { srcAttr =>
              srcAttr.exprId -> paths.flatMap { p =>
                r.metadataOutput
                  .find(_.name.equalsIgnoreCase(shredColName(p)))
                  .map(p -> _)
              }.toMap
            }
          }
      }.flatten.toMap
      if (maps.isEmpty) plan
      else plan.transformAllExpressions {
        case g @ GetJsonObject(a: AttributeReference,
            Literal(p: org.apache.spark.unsafe.types.UTF8String,
              StringType)) =>
          maps.get(a.exprId).flatMap(_.get(p.toString)).getOrElse(g)
      }
    }
  }
}
