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
}
