package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TemporalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof: latest right at or before left time; inclusive bound; ties by tieCol") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00"))
    ).toDF("id", "k", "t")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 09:30:00")),
      (102L, 10L, ts("2024-01-01 10:00:00")), // equal ts: inclusive
      (103L, 10L, ts("2024-01-01 10:00:00")), // tie: greater id wins
      (104L, 10L, ts("2024-01-01 11:00:00")),
      (105L, 30L, ts("2024-01-01 00:00:00"))
    ).toDF("rid", "k", "rt")
    val out = AsofJoin.asof(left, right, "k", "t", "rt",
        payload = Seq("rid", "rt"), tieCol = "rid")
      .orderBy("id")
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, Some(103L)),  // 10:00 tie -> greatest rid among ts <= 10:00
      (2L, Some(104L)),  // latest before 12:00
      (3L, None)))       // no right row for key 20
  }

  test("asof: NULL timestamps match nothing on either side, both directions") {
    val left = Seq(
      (1L, 10L, Some(ts("2024-01-01 10:00:00"))),
      (2L, 10L, None) // null left time: keeps its row, matches nothing
    ).toDF("id", "k", "t")
    val right = Seq(
      (101L, 10L, None), // null right time: can satisfy neither bound
      (102L, 10L, Some(ts("2024-01-01 09:00:00")))
    ).toDF("rid", "k", "rt")
    val back = AsofJoin.asof(left, right, "k", "t", "rt", Seq("rid"), "rid")
      .orderBy("id").select("id", "asof_rid")
      .as[(Long, Option[Long])].collect().toSeq
    assert(back == Seq((1L, Some(102L)), (2L, None)))
    val fwd = AsofJoin.asofForward(left, right, "k", "t", "rt", Seq("rid"), "rid")
      .orderBy("id").select("id", "asof_rid")
      .as[(Long, Option[Long])].collect().toSeq
    // 09:00 < 10:00, so forward finds nothing for row 1 either — and the
    // null-time rows never produce a bogus carry
    assert(fwd == Seq((1L, None), (2L, None)))
  }

  test("asof matches a window-SQL reference on the fixture events") {
    val ev = graft.Tables.t(spark, TestSpark.Sf0001, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pt"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id"), col("ts").as("ct"))
    val ours = AsofJoin.asof(p, c, "user_id", "pt", "ct", Seq("cid"), "cid")
      .filter(col("asof_cid").isNotNull)
      .select(col("pid"), col("asof_cid")).as[(Long, Long)].collect().toMap
    // reference: rank the (purchase x earlier-click) pairs per purchase
    p.createOrReplaceTempView("tj_p"); c.createOrReplaceTempView("tj_c")
    val ref = spark.sql(
      """SELECT pid, cid FROM (
        |  SELECT p.pid, c.cid,
        |    row_number() OVER (PARTITION BY p.pid ORDER BY c.ct DESC, c.cid DESC) rn
        |  FROM tj_p p JOIN tj_c c ON c.user_id = p.user_id AND c.ct <= p.pt)
        |WHERE rn = 1""".stripMargin).as[(Long, Long)].collect().toMap
    assert(ours == ref)
  }

  test("range join: bucket equi-join equals the naive BETWEEN join") {
    val points = (0 until 200)
      .map(i => (i.toLong, ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00")))
      .toDF("pid", "pt")
    val intervals = Seq(
      (1L, ts("2024-01-01 02:30:00"), ts("2024-01-01 05:15:00")),
      (2L, ts("2024-01-01 04:00:00"), ts("2024-01-01 04:59:59")), // overlaps 1
      (3L, ts("2024-01-01 23:00:00"), ts("2024-01-01 23:59:00"))
    ).toDF("iid", "lo", "hi")
    val bucketed = RangeJoin.pointInInterval(points, intervals, "pt", "lo", "hi",
        bucketSeconds = 1800L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    val naive = intervals.join(points,
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("range join plan has no cartesian/nested-loop join") {
    val ev = graft.Tables.t(spark, TestSpark.Sf0001, "events")
    val windows = ev.select(date_trunc("day", col("ts")).as("day")).distinct()
      .withColumn("lo", col("day") + expr("INTERVAL 10 HOURS"))
      .withColumn("hi", col("day") + expr("INTERVAL 14 HOURS"))
    val plan = RangeJoin.pointInInterval(ev, windows, "ts", "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
