package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chunked sessionization must be BIT-IDENTICAL to the single-window
  * gaps-and-islands formulation for every slab size — including slabs
  * smaller than the gap (sessions spanning many slabs, empty slabs
  * between events) and slabs larger than any history (degenerating to
  * one slab per user, i.e. the plain window). The fixture leg runs the
  * real events table; the synthetic leg stresses boundary cases the
  * fixture's regular cadence never hits. */
class SessionizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val GapUs = 1800000000L // 30 min

  /** Reference: the q_sessionize single-window shape. */
  private def windowed(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("gap_us",
        expr("unix_micros(ts)") - lag(expr("unix_micros(ts)"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("gap_us").isNull || col("gap_us") > GapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"))
      .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  private def assertSame(ev: DataFrame, slabUs: Long): Unit = {
    val want = windowed(ev).orderBy("user_id").collect().toSeq
    val got = Sessionize.chunked(ev, "user_id", "ts", GapUs, slabUs)
      .orderBy("user_id").collect().toSeq
    assert(got === want, s"slabUs=$slabUs diverged from the window result")
  }

  /** Deterministic pseudo-random event log: gaps cluster around the
    * 30-min threshold (exactly-at, just-over, far-over) so boundary
    * decisions are exercised, not dodged. */
  private def synthetic(): DataFrame = {
    val rnd = new scala.util.Random(0xC0FFEE)
    val rows = (0 until 40).flatMap { u =>
      var t = 1700000000000000L + rnd.nextInt(1000000)
      (0 until rnd.nextInt(120)).map { _ =>
        t += (rnd.nextInt(5) match {
          case 0 => GapUs            // exactly the gap: same session (> rule)
          case 1 => GapUs + 1        // one microsecond over: new session
          case 2 => rnd.nextInt(60) * 1000000L // seconds apart
          case 3 => 0L               // duplicate timestamp
          case _ => GapUs * (1 + rnd.nextInt(200)) // spans many slabs
        })
        (u.toLong, new java.sql.Timestamp(t / 1000))
      }
    }
    rows.toDF("user_id", "raw_ts")
      .select(col("user_id"), to_timestamp(col("raw_ts")).as("ts"))
  }

  test("chunked == windowed on the fixture events table (day slabs)") {
    val ev = graft.Tables.t(spark, TestSpark.Sf0001, "events")
      .select(col("user_id"), col("ts"))
    assertSame(ev, 86400000000L)
  }

  test("chunked == windowed across adversarial slab sizes") {
    val ev = synthetic()
    // minute slabs (<< gap: every session crosses slabs), the gap
    // itself, an odd prime microsecond count, a day, and one slab so
    // large the operator degenerates to the plain window
    for (slab <- Seq(60000000L, GapUs, 9999999967L, 86400000000L,
        Long.MaxValue / 4))
      assertSame(ev, slab)
  }

  /** Reference for session-level rows: single ordered window. */
  private def windowedSessions(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("us", expr("unix_micros(ts)"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("gap_us").isNull || col("gap_us") > GapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("sid").as("session_id"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"))
  }

  test("chunkedSessions == windowed session rows across slab sizes") {
    val ev = synthetic()
    for (slab <- Seq(60000000L, GapUs, 9999999967L, 86400000000L,
        Long.MaxValue / 4)) {
      val want = windowedSessions(ev)
        .orderBy("user_id", "session_id").collect().toSeq
      val got = Sessionize.chunkedSessions(ev, "user_id", "ts", GapUs, slab)
        .orderBy("user_id", "session_id").collect().toSeq
      assert(got === want, s"slabUs=$slab session rows diverged")
    }
  }

  test("empty input and single-event users") {
    val ev = Seq((1L, "2024-01-01 00:00:00"))
      .toDF("user_id", "s").select(col("user_id"), to_timestamp(col("s")).as("ts"))
    val out = Sessionize.chunked(ev, "user_id", "ts").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 1L, 1L)))
    assert(Sessionize.chunked(ev.limit(0), "user_id", "ts").count() === 0L)
  }
}
