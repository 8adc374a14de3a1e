package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator-coverage query; each has a matching
  * `oracleSql` entry (ANSI SQL for DuckDB over the same parquet tables)
  * unless the operator is not SQL-expressible, in which case the driver
  * records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * LLM-pipeline extension surface (BASELINE north star). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Ingestion.queries ++
    graft.queries.Relational.queries ++
    graft.queries.LlmPipeline.queries ++
    graft.queries.Streaming.queries ++
    graft.queries.Temporal.queries ++
    graft.queries.Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Ingestion.oracles ++
    graft.queries.Relational.oracles ++
    graft.queries.LlmPipeline.oracles ++
    graft.queries.Streaming.oracles ++
    graft.queries.Temporal.oracles ++
    graft.queries.Analytics.oracles
}
