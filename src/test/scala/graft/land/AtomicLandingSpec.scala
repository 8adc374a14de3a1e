package graft.land

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class AtomicLandingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft-acid").resolve("t").toString

  test("commit publishes atomically; versions increment") {
    val table = freshTable()
    val nation = graft.Tables.t(spark, TestSpark.Sf0001, "nation")
    assert(AtomicLanding.currentVersion(table).isEmpty)
    assert(AtomicLanding.commit(nation, table) == 0L)
    assert(AtomicLanding.commit(nation.limit(3), table) == 1L)
    assert(AtomicLanding.currentVersion(table).contains(1L))
    assert(AtomicLanding.read(spark, table).count() == 3)
  }

  test("a crash after staging but before publish loses NOTHING: readers keep the old snapshot") {
    val table = freshTable()
    val nation = graft.Tables.t(spark, TestSpark.Sf0001, "nation")
    AtomicLanding.commit(nation, table)
    val before = AtomicLanding.read(spark, table).count()

    // kill-mid-write: die at the exact point the reference's
    // write-then-record ordering is vulnerable — data staged, not published
    intercept[RuntimeException] {
      AtomicLanding.commit(nation.limit(1), table,
        beforePublish = () => throw new RuntimeException("kill -9"))
    }

    assert(AtomicLanding.currentVersion(table).contains(0L))
    assert(AtomicLanding.read(spark, table).count() == before)

    // recovery: the next commit proceeds past the orphan and publishes
    val v = AtomicLanding.commit(nation.limit(5), table)
    assert(v == 1L)
    assert(AtomicLanding.read(spark, table).count() == 5)
  }

  test("vacuum removes aborted staging dirs and superseded snapshots, never the live one") {
    val table = freshTable()
    val nation = graft.Tables.t(spark, TestSpark.Sf0001, "nation")
    AtomicLanding.commit(nation, table)
    // an aborted write that died mid-staging (no _SUCCESS, never moved)
    nation.limit(1).write.parquet(s"$table/.staging/died-mid-write")
    AtomicLanding.commit(nation.limit(2), table)

    val removed = AtomicLanding.vacuum(table)
    assert(removed.exists(_.contains(".staging")))   // the aborted write
    assert(removed.exists(_.contains("v-0000000000"))) // the superseded snapshot
    assert(AtomicLanding.read(spark, table).count() == 2) // live snapshot intact
    assert(AtomicLanding.vacuum(table).isEmpty)      // idempotent
  }

  test("uncommitted staging files are invisible to a concurrent reader") {
    val table = freshTable()
    val nation = graft.Tables.t(spark, TestSpark.Sf0001, "nation")
    AtomicLanding.commit(nation.filter(col("n_nationkey") < 10), table)
    // partial write sitting in staging (simulates an in-flight job)
    nation.write.parquet(s"$table/.staging/in-flight")
    assert(AtomicLanding.read(spark, table).count() ==
      nation.filter(col("n_nationkey") < 10).count())
  }
}
