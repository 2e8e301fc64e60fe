package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan → DataFrame bridge. Spark 4 keeps `Dataset.ofRows`
  * `private[sql]`; a library that contributes its own logical operators
  * (graft's native as-of join) still needs to hand a custom node to the
  * session, so this one-liner lives under the sql package — the same
  * technique as [[ColumnBridge]]. No other internal API is touched. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
