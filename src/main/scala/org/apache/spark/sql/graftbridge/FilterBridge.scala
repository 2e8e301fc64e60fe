package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.Filter

/** Catalyst `Expression` → V1 `Filter` bridge. Spark keeps
  * `DataSourceStrategy.translateFilter` `protected[sql]`; graft's lake
  * scan builder receives catalyst filter expressions (the file-source
  * pushdown interface) and wants the stable V1 filter algebra for its
  * manifest-stats file pruning, so this one-liner lives under the sql
  * package — the [[ColumnBridge]] technique. No other internal API is
  * touched. */
object FilterBridge {
  def toV1(e: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(e,
      supportNestedPredicatePushdown = false)
}
