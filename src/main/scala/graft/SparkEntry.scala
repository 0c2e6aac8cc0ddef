package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Aggregates, Conversions, Curation, CustomExprs, Extras, Functions, GraphOps, LlmOps, Ndsh, PipelineOps, Relational, Reshape, Retrieval, StreamingGate, TextOps, UdfSurface, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module's registry. Each module contributes
  * `Map[String, Q]` where a [[Q]] pairs the Spark implementation with the
  * DuckDB-oracle SQL (when SQL-expressible).
  */
object SparkEntry {

  /** All declared operator queries, keyed by SURVEY §2 inventory name. */
  def registry: Map[String, Q] =
    Ndsh.queries ++ Relational.queries ++ Aggregates.queries ++
      Windows.queries ++ Functions.queries ++ TextOps.queries ++
      LlmOps.queries ++ CustomExprs.queries ++ Conversions.queries ++
      UdfSurface.queries ++ Extras.queries ++ Reshape.queries ++
      GraphOps.queries ++ Curation.queries ++ Retrieval.queries ++
      PipelineOps.queries ++ StreamingGate.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Ndsh.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
