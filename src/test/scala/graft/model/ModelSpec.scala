package graft.model

import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {

  private val pc = PathConvention("dl-fw", "us-east-2")

  test("raw landing path and timestamp token round-trip") {
    val ts = "20240110123456"
    val path = pc.rawLanding(3, 7, ts)
    assert(path == "s3://dl-fw-3-us-east-2/7/init/20240110123456")
    assert(pc.timestampToken(path) == ts)
    assert(pc.parseTs(ts) == java.sql.Timestamp.valueOf("2024-01-10 12:34:56"))
  }

  test("formatTs/parseTs round-trip at second granularity") {
    val inst = java.time.Instant.parse("2025-12-31T23:59:59Z")
    val tok = pc.formatTs(inst)
    assert(tok == "20251231235959")
    assert(pc.parseTs(tok).toInstant == inst)
  }

  test("inbound buckets select by trigger mechanism") {
    assert(pc.inboundBucket(TriggerMechanism.TimeDriven) ==
      "dl-fw-time-drvn-inbound-us-east-2")
    assert(pc.inboundBucket(TriggerMechanism.EventDriven) ==
      "dl-fw-evnt-drvn-inbound-us-east-2")
  }

  test("event key parse accepts exactly init/src/asset/file") {
    assert(pc.parseEventKey("init/3/7/data.csv").contains((3, 7)))
    assert(pc.parseEventKey("init/3/7/").isEmpty)         // empty leaf
    assert(pc.parseEventKey("init/3/7/a/b.csv").isEmpty)  // 5 segments
    assert(pc.parseEventKey("proc/3/7/data.csv").isEmpty) // wrong root
    assert(pc.parseEventKey("init/x/7/data.csv").isEmpty) // non-numeric
  }

  test("DbType urls: sqlserver carries the port (reference bug fixed)") {
    assert(DbType.SqlServer.url("h", 1433, "db") ==
      "jdbc:sqlserver://h:1433;databaseName=db")
    assert(DbType.Postgres.url("h", 5432, "db") == "jdbc:postgresql://h:5432/db")
    assert(DbType.Oracle.url("h", 1521, "db") == "jdbc:oracle:thin:@//h:1521/db")
    assert(DbType.MySql.url("h", 3306, "db") == "jdbc:mysql://h:3306/db")
  }

  test("only postgres qualifies table names with the schema") {
    assert(DbType.all.filter(_.qualifiesSchema) == Seq(DbType.Postgres))
  }

  test("enum parsing rejects unknown values") {
    assert(IngestionPattern.parse(" Database ") == IngestionPattern.Database)
    assert(ExtractionMethod.parse("FULL") == ExtractionMethod.Full)
    assertThrows[IllegalArgumentException](IngestionPattern.parse("queue"))
    assertThrows[IllegalArgumentException](ExtractionMethod.parse("delta"))
    assertThrows[IllegalArgumentException](DbType.parse("db2"))
    assertThrows[IllegalArgumentException](TriggerMechanism.parse("cron"))
  }
}
