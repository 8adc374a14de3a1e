package graft.stream

import java.sql.DriverManager
import java.util.Properties

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.files.FileRelay

class JdbcBatchSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val url = "jdbc:derby:memory:graftsink;create=true"
  private val props = new Properties()

  private def count(where: String = ""): Long = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement()
        .executeQuery(s"SELECT count(*) FROM events_out $where")
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  test("streamed batches land once; a replayed (even partial) batch converges") {
    val c = DriverManager.getConnection(url)
    try c.createStatement().executeUpdate(
      "CREATE TABLE events_out (k BIGINT, batch_id BIGINT)")
    finally c.close()

    val t = java.nio.file.Files.createTempDirectory("graft-jdbcsink").toString
    val relay = new FileRelay()
    relay.writeUtf8(new Path(s"$t/in/b1.json"),
      (1 to 4).map(i => s"""{"k":$i}""").mkString("\n"))
    relay.writeUtf8(new Path(s"$t/in/b2.json"),
      (5 to 7).map(i => s"""{"k":$i}""").mkString("\n"))

    val sink = new JdbcBatchSink(url, props, "events_out")
    val q = spark.readStream
      .schema(StructType(Seq(StructField("k", LongType))))
      .option("maxFilesPerTrigger", 1).json(s"$t/in")
      .writeStream.foreachBatch(sink.apply _)
      .option("checkpointLocation", s"$t/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(count() == 7)
    assert(count("WHERE batch_id = 1") == 3)

    // crash-replay of batch 1, arriving AFTER a partial write survived:
    // plant a leftover partial row, then replay the whole batch
    val c2 = DriverManager.getConnection(url)
    try c2.createStatement().executeUpdate(
      "INSERT INTO events_out VALUES (99, 1)")
    finally c2.close()
    import spark.implicits._
    sink(Seq(5L, 6L, 7L).toDF("k"), 1L)
    assert(count() == 7)                         // converged, no dup, no 99
    assert(count("WHERE k = 99") == 0)           // partial leftover erased
    assert(count("WHERE batch_id = 1") == 3)
  }
}
