package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t, dec}
import graft.ingest.ParquetTableSource
import graft.sql.QueryBuilder

/** Ingestion-parity query surface — one entry per SURVEY §2.1-2.3 operator,
  * run over the fixture tables (the JDBC-specific pieces are unit-tested as
  * SQL construction in `graft.ingest.ExtractionSql`; here the same
  * semantics execute against parquet so the DuckDB oracle can check them).
  */
object Ingestion {

  type Q = (SparkSession, String) => DataFrame

  /** Fixed lower watermark for the deterministic incremental query —
    * plays the role of the catalog's `last_ext_time`. */
  val LastWatermark = "2024-01-10 00:00:00"

  val queries: Map[String, Q] = Map(

    // ---- P1: full-table projection (SELECT *) ----
    "q_full_scan" -> ((s, dir) =>
      t(s, dir, "region").orderBy(col("r_regionkey"))),

    // ---- P2/P3: column projection (pruned at the parquet scan) ----
    "q_projection" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), dec(col("o_totalprice")).cast("double").as("total"))
        .filter(col("o_orderkey") <= 500)
        .orderBy(col("o_orderkey"))),

    // ---- A1: watermark probe max(ext_col) — partial+final max, no sort ----
    "q_watermark_probe" -> ((s, dir) =>
      t(s, dir, "events").agg(max(col("ts")).as("max_ts"))),

    // ---- §3.2: the incremental extract — probe the upper bound FIRST
    // (snapshot), then read the half-open interval (last, max]. Two
    // source reads, exactly like the reference lifecycle. ----
    "q_incremental_extract" -> ((s, dir) => {
      val src = new ParquetTableSource(s, dir, "events")
      val maxTs = src.probeMax("ts").get
      src.readInterval("ts", java.sql.Timestamp.valueOf(LastWatermark), maxTs)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    // ---- P6: null-excluding filter (watermark lookup shape) ----
    "q_null_filter" -> ((s, dir) =>
      t(s, dir, "events")
        .filter(col("props").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // ---- A2/A3/A5: top-k = ORDER BY ... LIMIT k (TakeOrderedAndProject) ----
    "q_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), dec(col("o_totalprice")).cast("double").as("total"))),

    // ---- A4: OFFSET pagination ----
    "q_offset" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_orderkey"))
        .offset(5)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))),

    // ---- A6: first-row metadata lookup by key ----
    "q_first_row" -> ((s, dir) =>
      t(s, dir, "nation").filter(col("n_nationkey") === 7)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),

    // ---- S9/P5/A2/A3: the control-store query builder generating the SQL
    // that BOTH engines run (builder output is the oracle string) ----
    "q_builder_select" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("nation")
      s.sql(BuilderSelectSql)
    }),
  )

  /** Builder-generated SQL shared verbatim between Spark and DuckDB —
    * exercises SELECT cols / WHERE / ORDER BY / LIMIT / OFFSET
    * (`pg_connect.py:164-183,114-152` surface). */
  val BuilderSelectSql: String = QueryBuilder.Select(
    table = "nation",
    cols = Seq("n_nationkey", "n_name", "n_regionkey"),
    where = Some("n_regionkey >= 1"),
    orderBy = Seq(("n_regionkey", true), ("n_nationkey", false)),
    limit = Some(8),
    offset = Some(2)).sql

  val oracles: Map[String, String] = Map(
    "q_full_scan" -> "SELECT * FROM region ORDER BY r_regionkey",

    "q_projection" ->
      """SELECT o_orderkey, cast(cast(o_totalprice as decimal(18,2)) as double) AS total
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,

    "q_watermark_probe" -> "SELECT max(ts) AS max_ts FROM events",

    "q_incremental_extract" ->
      s"""SELECT event_id, ts, user_id, event_type FROM events
         |WHERE ts > timestamp '$LastWatermark'
         |  AND ts <= (SELECT max(ts) FROM events)
         |ORDER BY event_id""".stripMargin,

    "q_null_filter" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE props IS NOT NULL AND event_type IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, cast(cast(o_totalprice as decimal(18,2)) as double) AS total
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_offset" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey LIMIT 10 OFFSET 5""".stripMargin,

    "q_first_row" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_nationkey = 7""".stripMargin,

    "q_builder_select" -> BuilderSelectSql,
  )
}
