package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.files.FileRelay

/** SURVEY §7.4 risk 4 / r1 VERDICT item 7: the Structured Streaming path
  * actually runs, and its parsed events match the batch-compat merge
  * (events compared, not bytes — the byte formats differ by design). */
class StreamingPathSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("kind", StringType)))

  private def writeFixtures(dir: String): Unit = {
    val relay = new FileRelay()
    relay.writeUtf8(new Path(s"$dir/in/p1.json"),
      """{"id":1,"kind":"a"}{"id":2,"kind":"b"}""")
    relay.writeUtf8(new Path(s"$dir/in/p2.json"),
      """{"id":3,"kind":"a"}""")
  }

  test("streaming merge (AvailableNow) lands the same events as mergeCompat") {
    val t = java.nio.file.Files.createTempDirectory("graft-stream").toString
    writeFixtures(t)

    // scale path: streaming read of the raw concatenated format → parquet
    val stream = StreamMerger.streamConcatenated(spark, schema, s"$t/in")
    assert(stream.isStreaming)
    StreamMerger.runAvailableNow(stream, s"$t/out-stream", s"$t/ckpt")
    val streamed = spark.read.parquet(s"$t/out-stream")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    // compat path: one merged JSON-array file
    val relay = new FileRelay()
    val n = StreamMerger.mergeCompat(relay, s"$t/in",
      s"$t/out-compat/streaming_file.json", s"$t/processed")
    val merged = spark.read.option("multiLine", "true")
      .schema(schema).json(s"$t/out-compat/streaming_file.json")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    assert(n == 3)
    assert(streamed == Set((1L, "a"), (2L, "b"), (3L, "a")))
    assert(streamed == merged) // parse-equivalence of the two modes
  }

  test("streaming restart processes only new files (exactly-once bookkeeping)") {
    val t = java.nio.file.Files.createTempDirectory("graft-stream2").toString
    writeFixtures(t)
    val stream = StreamMerger.streamConcatenated(spark, schema, s"$t/in")
    StreamMerger.runAvailableNow(stream, s"$t/out", s"$t/ckpt")
    assert(spark.read.parquet(s"$t/out").count() == 3)

    // a new object lands; re-running the AvailableNow merge must append
    // ONLY its events (the checkpoint's processed-file log replaces the
    // reference's delete-inputs step)
    new FileRelay().writeUtf8(new Path(s"$t/in/p3.json"), """{"id":4,"kind":"c"}""")
    StreamMerger.runAvailableNow(
      StreamMerger.streamConcatenated(spark, schema, s"$t/in"), s"$t/out", s"$t/ckpt")
    val rows = spark.read.parquet(s"$t/out")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c")))
  }

  test("watermarked tumbling-window aggregation over a stream") {
    val t = java.nio.file.Files.createTempDirectory("graft-stream3").toString
    val relay = new FileRelay()
    relay.writeUtf8(new Path(s"$t/in/e.json"),
      """{"ts":"2024-01-10 10:05:00","kind":"x"}""" +
      """{"ts":"2024-01-10 10:45:00","kind":"x"}""" +
      """{"ts":"2024-01-10 11:05:00","kind":"y"}""")
    val sch = StructType(Seq(
      StructField("ts", TimestampType), StructField("kind", StringType)))
    val counts = StreamMerger.windowedEventCounts(
      StreamMerger.streamConcatenated(spark, sch, s"$t/in"), "ts", "kind")
    val q = counts.writeStream
      .format("memory").queryName("win_counts").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("win_counts")
      .selectExpr("window.start", "kind", "count").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(
      ("2024-01-10 10:00:00.0", "x", 2L),
      ("2024-01-10 11:00:00.0", "y", 1L)))
  }
}
