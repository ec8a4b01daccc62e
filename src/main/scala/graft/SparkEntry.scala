package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, AnnQueries, DocQueries, EventQueries, RelationalQueries, RetrievalQueries, TemporalQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` holds the DuckDB-equivalent
  * SQL for the driver's correctness gate. Query bodies live in
  * `graft.queries.*` / `graft.operators.*`; this object only aggregates
  * the registries.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.knnExactL2(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ VectorQueries.queries ++ AnnQueries.queries ++
      DocQueries.queries ++ EventQueries.queries ++ TemporalQueries.queries ++
      RetrievalQueries.queries ++ AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ VectorQueries.oracles ++ AnnQueries.oracles ++
      DocQueries.oracles ++ EventQueries.oracles ++ TemporalQueries.oracles ++
      RetrievalQueries.oracles ++ AnalyticsQueries.oracles
}
