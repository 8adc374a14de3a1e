package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.{AsofJoin, RangeJoin}

/** Temporal operators Spark lacks as built-ins — as-of join and interval
  * (range) join — implemented with scale-safe compositions
  * ([[graft.operators.AsofJoin]]: union + ordered window, one shuffle;
  * [[graft.operators.RangeJoin]]: time-bucket equi-join, no cartesian)
  * and verified against deterministic DuckDB window/BETWEEN oracles.
  */
object Temporal {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // ---- as-of join: for each purchase, the user's latest click at or
    // before the purchase time ----
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pt"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"), col("ts").as("ct"))
      AsofJoin.asof(purchases, clicks, key = "user_id",
          lTime = "pt", rTime = "ct", payload = Seq("cid", "ct"), tieCol = "cid")
        .filter(col("asof_cid").isNotNull) // inner as-of
        .select(col("pid"), col("user_id"), col("pt"),
          col("asof_cid").as("cid"), col("asof_ct").as("ct"))
        .orderBy(col("pid"))
    }),

    // ---- forward as-of: each purchase matched to the NEXT click at or
    // after it (the mirror direction; pandas merge_asof offers both) ----
    "q_asof_join_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pt"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"), col("ts").as("ct"))
      AsofJoin.asofForward(purchases, clicks, key = "user_id",
          lTime = "pt", rTime = "ct", payload = Seq("cid", "ct"), tieCol = "cid")
        .filter(col("asof_cid").isNotNull)
        .select(col("pid"), col("user_id"), col("pt"),
          col("asof_cid").as("cid"), col("asof_ct").as("ct"))
        .orderBy(col("pid"))
    }),

    // ---- interval join: events falling in each day's 10:00-14:00
    // maintenance window, counted per (day, type) ----
    "q_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val windows = ev.select(date_trunc("day", col("ts")).as("day")).distinct()
        .withColumn("lo", col("day") + expr("INTERVAL 10 HOURS"))
        .withColumn("hi", col("day") + expr("INTERVAL 14 HOURS"))
      RangeJoin.pointInInterval(ev, windows, "ts", "lo", "hi")
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("day"), col("event_type"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH p AS (SELECT event_id pid, user_id, ts pt FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT event_id cid, user_id, ts ct FROM events
        |      WHERE event_type = 'click'),
        |r AS (SELECT p.pid, p.user_id, p.pt, c.cid, c.ct,
        |        row_number() OVER (PARTITION BY p.pid
        |          ORDER BY c.ct DESC, c.cid DESC) rn
        |      FROM p JOIN c ON c.user_id = p.user_id AND c.ct <= p.pt)
        |SELECT pid, user_id, pt, cid, ct FROM r WHERE rn = 1 ORDER BY pid""".stripMargin,

    "q_asof_join_forward" ->
      """WITH p AS (SELECT event_id pid, user_id, ts pt FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT event_id cid, user_id, ts ct FROM events
        |      WHERE event_type = 'click'),
        |r AS (SELECT p.pid, p.user_id, p.pt, c.cid, c.ct,
        |        row_number() OVER (PARTITION BY p.pid
        |          ORDER BY c.ct ASC, c.cid DESC) rn
        |      FROM p JOIN c ON c.user_id = p.user_id AND c.ct >= p.pt)
        |SELECT pid, user_id, pt, cid, ct FROM r WHERE rn = 1 ORDER BY pid""".stripMargin,

    "q_range_join" ->
      """WITH days AS (SELECT DISTINCT date_trunc('day', ts) d FROM events),
        |iv AS (SELECT d, d + INTERVAL 10 HOUR lo, d + INTERVAL 14 HOUR hi FROM days),
        |j AS (SELECT iv.d, e.event_type FROM iv
        |      JOIN events e ON e.ts >= iv.lo AND e.ts <= iv.hi)
        |SELECT d AS day, event_type, count(*) AS n
        |FROM j GROUP BY d, event_type ORDER BY day, event_type""".stripMargin,
  )
}
