package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Base class for ScanBuilders that WRAP one of Spark's own file scan
  * builders (graft's lake catalog wraps `ParquetScanBuilder` to add
  * manifest-stats aggregate answering and runtime file pruning on
  * top of the stock parquet pushdown stack). Spark's file builders
  * take filters through the `private[sql]`
  * `SupportsPushDownCatalystFilters` interface rather than the public
  * `SupportsPushDownFilters`, so the forwarding shim must live under
  * the sql package — the [[ColumnBridge]] technique; no other
  * internal API is touched. Everything the file builder can push
  * (filters, partition pruning, column pruning) forwards unchanged;
  * subclasses decide what `build()` returns. */
abstract class DelegatingFileScanBuilder(inner: FileScanBuilder)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters {

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner.pushFilters(filters)

  override def pushedFilters: Array[Predicate] = inner.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)

  protected def innerBuild(): Scan = inner.build()

  /** True once any filter reached the inner builder — a
    * stats-answered aggregate is only sound over the unfiltered
    * snapshot. (A filter the builder could NOT push leaves a Filter
    * node above the scan, which already blocks aggregate pushdown at
    * the planner level — pushed filters are the case to guard.) */
  protected def innerHasFilters: Boolean =
    inner.pushedFilters.nonEmpty
}
