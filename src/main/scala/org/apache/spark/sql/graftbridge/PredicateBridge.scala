package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter

/** V2 `Predicate` → V1 `Filter` bridge. Spark keeps `PredicateUtils`
  * `private[sql]`; a V2 table implementing `SupportsDeleteV2` receives
  * V2 predicates and wants the stable V1 filter algebra to act on them
  * (graft's lake catalog turns them into `Column`s for its
  * copy-on-write delete), so this one-liner lives under the sql
  * package — the [[ColumnBridge]] technique. No other internal API is
  * touched. */
object PredicateBridge {
  def toV1(p: Predicate): Option[Filter] = PredicateUtils.toV1(p)
}
