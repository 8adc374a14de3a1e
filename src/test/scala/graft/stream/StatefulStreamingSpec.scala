package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.files.FileRelay

class StatefulStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("userId", LongType), StructField("eventId", LongType)))

  private def readStream(dir: String) = {
    import spark.implicits._
    spark.readStream.schema(schema).json(s"$dir/in").as[Stateful.UserEvent]
  }

  test("flatMapGroupsWithState keeps per-user state across restarts") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-state").toString
    val relay = new FileRelay()
    relay.writeUtf8(new Path(s"$t/in/b1.json"),
      """{"userId":1,"eventId":10}
        |{"userId":1,"eventId":11}
        |{"userId":2,"eventId":20}""".stripMargin)

    // memory sink cannot recover from a checkpoint; foreachBatch can —
    // it is also the production shape for update-mode stateful output
    val emitted = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    def runOnce(): Set[(Long, Long, Long)] = {
      emitted.synchronized(emitted.clear())
      val q = Stateful.runningUserTotals(readStream(t)).toDF()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          emitted.synchronized(emitted ++= rows)
          ()
        }
        .outputMode("update").option("checkpointLocation", s"$t/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      emitted.synchronized(emitted.toSet)
    }

    assert(runOnce() == Set((1L, 2L, 11L), (2L, 1L, 20L)))

    // restart with new data: lifetime totals continue from checkpointed state
    relay.writeUtf8(new Path(s"$t/in/b2.json"),
      """{"userId":1,"eventId":12}
        |{"userId":3,"eventId":30}""".stripMargin)
    assert(runOnce() == Set((1L, 3L, 12L), (3L, 1L, 30L))) // user 1: 2+1 events
  }

  test("streaming dedup suppresses ids replayed in a later batch") {
    val t = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val relay = new FileRelay()
    relay.writeUtf8(new Path(s"$t/in/b1.json"),
      """{"userId":1,"eventId":100}
        |{"userId":1,"eventId":101}""".stripMargin)

    def runOnce(): Unit = {
      val q = Stateful.dedupeById(
          spark.readStream.schema(schema).json(s"$t/in"), "eventId")
        .writeStream.format("parquet")
        .option("path", s"$t/out").option("checkpointLocation", s"$t/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    assert(spark.read.parquet(s"$t/out").count() == 2)

    // batch 2 replays id 101 (at-least-once delivery) and adds 102
    relay.writeUtf8(new Path(s"$t/in/b2.json"),
      """{"userId":1,"eventId":101}
        |{"userId":1,"eventId":102}""".stripMargin)
    runOnce()
    val ids = spark.read.parquet(s"$t/out")
      .select("eventId").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(100L, 101L, 102L)) // 101 not duplicated
  }

  test("watermarked dedup bounds state: old keys evicted, out-of-watermark replay dropped") {
    val t = java.nio.file.Files.createTempDirectory("graft-wdedup").toString
    val relay = new FileRelay()
    val tsSchema = StructType(Seq(
      StructField("eventId", LongType), StructField("ts", TimestampType)))
    // batch 1: 100 keys in the first 100 seconds of the hour
    relay.writeUtf8(new Path(s"$t/in/b1.json"),
      (1 to 100).map(i =>
        s"""{"eventId":$i,"ts":"2026-01-01T00:${"%02d".format(i / 60)}:${"%02d".format(i % 60)}.000Z"}""")
        .mkString("\n"))
    // batch 2 (an hour later): fresh keys, a replay of key 5 at its OLD
    // event time (far behind the watermark), and a brand-new key with an
    // equally old timestamp. The replay dedupes against still-held state;
    // the late NEW key passes through (dedup-within-watermark filters
    // duplicates, not late first arrivals — the documented contract)
    relay.writeUtf8(new Path(s"$t/in/b2.json"),
      ((101 to 110).map(i => s"""{"eventId":$i,"ts":"2026-01-01T01:00:${"%02d".format(i - 101)}.000Z"}""") ++ Seq(
        """{"eventId":5,"ts":"2026-01-01T00:00:05.000Z"}""",
        """{"eventId":999,"ts":"2026-01-01T00:00:06.000Z"}"""))
        .mkString("\n"))

    var lastStateRows = -1L
    val q = Stateful.dedupeByIdWithinWatermark(
        spark.readStream.schema(tsSchema)
          .option("maxFilesPerTrigger", "1").json(s"$t/in"),
        "eventId", "ts", lateness = "10 seconds")
      .writeStream.format("parquet")
      .option("path", s"$t/out").option("checkpointLocation", s"$t/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    Option(q.lastProgress).flatMap(_.stateOperators.headOption)
      .foreach(so => lastStateRows = so.numRowsTotal)

    val ids = spark.read.parquet(s"$t/out")
      .select("eventId").collect().map(_.getLong(0)).sorted.toSeq
    // the out-of-watermark replay of 5 is dropped (no duplicate); the
    // late new key 999 is emitted once as a first arrival
    assert(ids == ((1L to 110L) :+ 999L))
    // state held only keys whose watermark window is still open at the
    // final batch — NOT all 111 keys ever seen (the dedupeById leak this
    // path fixes); measured 10 rows vs 100+ for the unbounded variant
    assert(lastStateRows >= 0 && lastStateRows < 60,
      s"state not bounded: $lastStateRows rows")
  }
}
