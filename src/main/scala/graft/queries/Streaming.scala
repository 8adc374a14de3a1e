package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.Tables.t
import graft.stream.StreamMerger

/** True-streaming coverage with a value-checked oracle: the events table
  * is spooled to NDJSON, consumed through the Structured Streaming file
  * source with a watermark + tumbling event-time window, and the final
  * counts are compared against DuckDB's batch hour-bucket aggregation —
  * the streaming and batch answers must agree exactly on bounded input
  * (one AvailableNow pass, complete output mode: no window is still open
  * when the query drains).
  */
object Streaming {

  type Q = (SparkSession, String) => DataFrame

  private val eventSchema = StructType(Seq(
    StructField("ts", TimestampType), StructField("event_type", StringType)))

  private val spooled = scala.collection.concurrent.TrieMap[String, String]()

  val queries: Map[String, Q] = Map(
    "q_stream_window" -> ((s, dir) => {
      // spool the fixture to NDJSON once per (jvm, sf dir) — the stream's
      // inbound prefix; the bench invokes each query three times and
      // re-spooling 100k rows dominated this query's wall time.
      // Timestamps serialize as ISO-8601; sub-second truncation cannot
      // move an event across an HOUR window boundary, so counts are safe.
      val tmp = spooled.getOrElseUpdate(dir, {
        val d = java.nio.file.Files.createTempDirectory("graft-qstream").toString
        t(s, dir, "events").select(col("ts"), col("event_type"))
          .write.mode("overwrite").json(s"$d/in")
        d
      })
      val counts = StreamMerger.windowedEventCounts(
        StreamMerger.readStream(s, eventSchema, s"$tmp/in"),
        "ts", "event_type", lateness = "10 minutes", windowSize = "1 hour")
      val q = counts.writeStream
        .format("memory").queryName("q_stream_window_mem")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("q_stream_window_mem")
        .select(col("window.start").as("window_start"), col("event_type"),
          col("count").as("n"))
        .orderBy(col("window_start"), col("event_type"))
    }))

  val oracles: Map[String, String] = Map(
    "q_stream_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)
}
