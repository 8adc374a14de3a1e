package graft.app

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.land.AtomicLanding
import graft.model.CatalogEntry

class TransactionalIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-txn").toString + "/root"

  private def entry(execId: String): CatalogEntry = CatalogEntry(
    execId = execId, srcSysId = 1, assetId = 101,
    dqValidation = CatalogEntry.StatusNotStarted,
    dataPublish = CatalogEntry.StatusNotStarted,
    dataMasking = CatalogEntry.StatusNotStarted,
    srcFilePath = s"raw/$execId", s3LogPath = s"logs/$execId",
    procStartTs = new Timestamp(1700000000000L),
    createdTs = new Timestamp(1700000001000L),
    lastExtTime = None)

  private lazy val docs = graft.Tables.t(spark, TestSpark.Sf0001, "documents")
    .select(col("doc_id"), col("source"))

  test("landing + catalog publish in one swing; crash between member commits and the root swing exposes NEITHER; the identified retry converges") {
    val root = freshRoot()
    val b1 = docs.filter(col("doc_id") < 100)
    // batch 1 lands clean
    val g1 = TransactionalIngest.ingest(spark, root, b1, entry("e1"),
      batchId = Some(1L))
    val Some((land1, cat1)) = TransactionalIngest.snapshot(spark, root)
    assert(land1.count() == b1.count())
    assert(cat1.select("execId").as[String].collect().toSeq == Seq("e1"))

    // batch 2 CRASHES between the member commits and the root swing —
    // the widest window (both members durably committed, root not)
    val b2 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
    val boom = intercept[RuntimeException] {
      TransactionalIngest.ingest(spark, root, b2, entry("e2"),
        batchId = Some(2L),
        beforeRootSwing =
          () => throw new RuntimeException("crash before the root swing"))
    }
    assert(boom.getMessage.contains("crash before the root swing"))
    // the torn state is unrepresentable: a root-resolving reader still
    // sees batch 1 EXACTLY — no landed-but-unrecorded data, no
    // recorded-but-unlanded run
    val Some((landT, catT)) = TransactionalIngest.snapshot(spark, root)
    assert(landT.count() == b1.count(),
      "crashed batch's data must be invisible through the root")
    assert(catT.select("execId").as[String].collect().toSeq == Seq("e1"),
      "crashed batch's run record must be invisible through the root")

    // the identified retry replays member commits as no-ops (watermark
    // covers id 2) and completes the publish
    val g2 = TransactionalIngest.ingest(spark, root, b2, entry("e2"),
      batchId = Some(2L))
    assert(g2 == g1 + 1)
    val Some((land2, cat2)) = TransactionalIngest.snapshot(spark, root)
    assert(land2.count() == b1.count() + b2.count(),
      "the retry must land batch 2 exactly once")
    assert(cat2.select("execId").as[String].collect().sorted.toSeq
      == Seq("e1", "e2"))

    // a FULL replay of an already-published batch is a pure no-op:
    // same generation, same rows, no duplicate run record
    assert(TransactionalIngest.ingest(spark, root, b2, entry("e2"),
      batchId = Some(2L)) == g2)
    val Some((land3, cat3)) = TransactionalIngest.snapshot(spark, root)
    assert(land3.count() == land2.count())
    assert(cat3.count() == 2)
  }

  test("snapshot pairs are torn-proof: a reader resolving mid-publish sees all-old or all-new, never landing without its record") {
    val root = freshRoot()
    TransactionalIngest.ingest(spark, root,
      docs.filter(col("doc_id") < 50), entry("e1"), batchId = Some(1L))
    // resolve the OLD generation, then publish a new one, then read the
    // old handles: version-pinned reads must still serve the old pair
    val Some((landOld, catOld)) = TransactionalIngest.snapshot(spark, root)
    val nOld = landOld.count(); val cOld = catOld.count()
    TransactionalIngest.ingest(spark, root,
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 120),
      entry("e2"), batchId = Some(2L))
    assert(landOld.count() == nOld && catOld.count() == cOld,
      "a resolved snapshot must be immune to later publishes")
    val Some((landNew, catNew)) = TransactionalIngest.snapshot(spark, root)
    assert(catNew.count() == 2 && landNew.count() > nOld)
  }
}
