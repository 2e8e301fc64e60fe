package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{BioQueries, DedupOps, EventOps, GraphOps, Relational, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2): each entry
  * is one operator exercised over the driver's star schema; `oracleSql`
  * carries the DuckDB-equivalent SQL with identical column names for the
  * hash-match correctness gate. Every query has an oracle: hash-dependent
  * operators (MinHash/SimHash/HLL) use engine-agnostic integer hashing
  * (see graft.functions.PolyHashMod) or emit in-engine-verified bounds so
  * DuckDB reproduces them exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap.empty[String, (SparkSession, String) => DataFrame] ++
      Relational.all ++ EventOps.all ++ TextOps.all ++
      SimilarityOps.all ++ DedupOps.all ++ GraphOps.all ++ BioQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap.empty[String, String] ++
      Relational.oracles ++ EventOps.oracles ++ TextOps.oracles ++
      SimilarityOps.oracles ++ DedupOps.oracles ++ GraphOps.oracles ++
      BioQueries.oracles
}
