package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The persisted semantic-dedup lifecycle: build / append / replay /
  * heal / incremental verdict — the seventh index tier held to the same
  * contract suite as the IVF/BM25/fuzzy/cluster states. */
class SemDedupStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-semstate").toString + "/st"

  private lazy val e = spark.read
    .parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def pert(src: org.apache.spark.sql.DataFrame, shift: Long,
      scale: Double) =
    src.select((col("vec_id") + shift).as("vec_id"),
      transform(col("embedding"),
        x => (x.cast("double") * lit(scale)).cast("float")).as("embedding"))

  test("buildSaved + verdictsSaved over the whole corpus is bit-identical to the one-shot SemDedup.dedup") {
    val base = e.unionByName(pert(e.filter(col("vec_id") < 20), 10000, 1.01))
    val p = freshPath()
    SemDedupState.buildSaved(base, p, nLists = 8)
    val saved = SemDedupState.verdictsSaved(spark, p, tau = 0.9)
      .orderBy("vec_id").collect().toSeq
    val oneShot = SemDedup.dedup(base, nLists = 8, tau = 0.9)
      .orderBy("vec_id").collect().toSeq
    assert(saved == oneShot,
      "the persisted pass must reproduce the in-session operator exactly")
  }

  test("growth is append-order-independent under the frozen quantizer") {
    val seed = e.filter(col("vec_id") < 30)
    val b1 = e.filter(col("vec_id") >= 30 && col("vec_id") < 60)
    val b2 = pert(e.filter(col("vec_id") < 10), 10000, 1.01)
    val (pA, pB) = (freshPath(), freshPath())
    SemDedupState.buildSaved(seed, pA, nLists = 8)
    SemDedupState.addToSaved(spark, pA, b1)
    SemDedupState.addToSaved(spark, pA, b2)
    SemDedupState.buildSaved(seed, pB, nLists = 8)
    SemDedupState.addToSaved(spark, pB, b2)
    SemDedupState.addToSaved(spark, pB, b1)
    assert(
      SemDedupState.verdictsSaved(spark, pA, 0.9).orderBy("vec_id").collect().toSeq
        == SemDedupState.verdictsSaved(spark, pB, 0.9).orderBy("vec_id").collect().toSeq,
      "frozen stats + frozen cents must make the grown state order-independent")
  }

  test("identified replays append nothing; id-less overlapping appends dedupe by vec_id") {
    val p = freshPath()
    SemDedupState.buildSaved(e.filter(col("vec_id") < 30), p, nLists = 8,
      batchId = Some(-1L))
    val batch = e.filter(col("vec_id") >= 30 && col("vec_id") < 50)
    SemDedupState.addToSaved(spark, p, batch, batchId = Some(0L))
    val n = SemDedupState.verdictsSaved(spark, p, 0.9).count()
    // at-least-once replay of a committed id: zero new rows
    SemDedupState.addToSaved(spark, p, batch, batchId = Some(0L))
    assert(SemDedupState.verdictsSaved(spark, p, 0.9).count() == n)
    // id-less append overlapping the durable state: anti-join dedupes,
    // only the genuinely-new vectors land
    SemDedupState.addToSaved(spark, p,
      e.filter(col("vec_id") >= 40 && col("vec_id") < 60))
    assert(SemDedupState.verdictsSaved(spark, p, 0.9).count() == n + 10)
  }

  test("crash between the codes commit and the root swing: readers keep the old generation, the retry and later appends heal forward") {
    import graft.land.AtomicLanding
    val p = freshPath()
    SemDedupState.buildSaved(e.filter(col("vec_id") < 30), p, nLists = 8,
      batchId = Some(-1L))
    val orphan = e.filter(col("vec_id") >= 30 && col("vec_id") < 40)
    intercept[RuntimeException] {
      SemDedupState.addToSaved(spark, p, orphan, batchId = Some(0L),
        beforeRootPublish =
          () => throw new RuntimeException("crash before root swing"))
    }
    // durable but unpublished: a root-resolving reader still sees the seed
    val snap = AtomicLanding.linkedSnapshot(p).get
    assert(AtomicLanding.currentVersion(s"$p/codes").get
      > snap.members("codes"), "live member must run ahead of the pin")
    assert(SemDedupState.verdictsSaved(spark, p, 0.9).count() == 30,
      "the crashed batch must be invisible through the root")
    // identified retry heals with zero re-reads; a later append lands on top
    SemDedupState.addToSaved(spark, p, orphan, batchId = Some(0L))
    assert(SemDedupState.verdictsSaved(spark, p, 0.9).count() == 40)
    SemDedupState.addToSaved(spark, p,
      e.filter(col("vec_id") >= 40 && col("vec_id") < 50), batchId = Some(1L))
    val healed = AtomicLanding.linkedSnapshot(p).get
    assert(healed.members("codes")
      == AtomicLanding.currentVersion(s"$p/codes").get,
      "the root must pin the live codes generation again")
    assert(SemDedupState.verdictsSaved(spark, p, 0.9).count() == 50)
  }

  test("dedupBatch: planted copies flagged with their standing original, sign-flips kept, and the pass is read-only") {
    import graft.land.AtomicLanding
    val p = freshPath()
    SemDedupState.buildSaved(e, p, nLists = 8)
    val before = SemDedupState.verdictsSaved(spark, p, 0.9)
      .orderBy("vec_id").collect().toSeq
    val rootBefore = AtomicLanding.currentRootVersion(p)
    val batch = pert(e.filter(col("vec_id") < 20), 10000, 1.01)
      .unionByName(pert(e.filter(col("vec_id") >= 20 && col("vec_id") < 30),
        20000, -1.0))
    val out = SemDedupState.dedupBatch(spark, p, batch, tau = 0.9).collect()
    assert(out.length == 30, "one verdict per batch vector, corpus emits nothing")
    val dup = out.filter(!_.getAs[Boolean]("kept"))
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("dup_of")).toMap
    (0L until 20L).foreach { v =>
      assert(dup.get(v + 10000).exists(w => w >= 0 && w < 10000),
        s"planted copy ${v + 10000} must dup against a STANDING witness")
    }
    out.filter(_.getAs[Long]("vec_id") >= 20000).foreach(r =>
      assert(r.getAs[Boolean]("kept"),
        s"sign-flipped ${r.getAs[Long]("vec_id")} must be novel"))
    // read-only: no root movement, standing verdicts untouched
    assert(AtomicLanding.currentRootVersion(p) == rootBefore)
    assert(SemDedupState.verdictsSaved(spark, p, 0.9)
      .orderBy("vec_id").collect().toSeq == before)
  }

  test("maintainSaved folds the micro-batch tail, keeps verdicts and replay-skip, and vacuums superseded generations") {
    import graft.land.AtomicLanding
    val p = freshPath()
    SemDedupState.buildSaved(e.filter(col("vec_id") < 30), p, nLists = 8,
      batchId = Some(-1L))
    (0 to 4).foreach { i =>
      SemDedupState.addToSaved(spark, p,
        e.filter(col("vec_id") >= 30 + i * 10 && col("vec_id") < 40 + i * 10),
        batchId = Some(i.toLong))
    }
    val codesT = s"$p/codes"
    assert(AtomicLanding.liveDirCount(codesT) == 6)
    val before = SemDedupState.verdictsSaved(spark, p, 0.9)
      .orderBy("vec_id").collect().toSeq
    val reclaimed = SemDedupState.maintainSaved(spark, p)
    assert(AtomicLanding.liveDirCount(codesT) == 1, "tail folded to one dir")
    assert(reclaimed.nonEmpty, "superseded generations reclaimed")
    assert(SemDedupState.verdictsSaved(spark, p, 0.9)
      .orderBy("vec_id").collect().toSeq == before,
      "the fold must not change a single verdict")
    // the batch-id watermark survived the fold: a replay still no-ops
    SemDedupState.addToSaved(spark, p,
      e.filter(col("vec_id") >= 70 && col("vec_id") < 80), batchId = Some(4L))
    assert(SemDedupState.verdictsSaved(spark, p, 0.9).count() == 80)
  }

  test("drift rebuild: buildSaved at the SAME path flips readers atomically from the old generation to the new") {
    import graft.land.AtomicLanding
    val p = freshPath()
    SemDedupState.buildSaved(e.filter(col("vec_id") < 30), p, nLists = 8)
    val rootBefore = AtomicLanding.currentRootVersion(p).get
    // a reader resolves the OLD generation before the rebuild
    val oldVerdicts = SemDedupState.verdictsSaved(spark, p, 0.9)
    val nOld = oldVerdicts.count()
    // rebuild over a bigger corpus (fresh stats, fresh cents) in place
    SemDedupState.buildSaved(e, p, nLists = 8)
    assert(AtomicLanding.currentRootVersion(p).get > rootBefore)
    assert(SemDedupState.verdictsSaved(spark, p, 0.9).count() == e.count(),
      "a post-rebuild resolve sees the NEW generation")
    assert(oldVerdicts.count() == nOld,
      "the pre-rebuild resolve still serves the old pinned pair")
  }

  test("a drift rebuild that crashes before its root swing never heals into a MIXED generation: the next append publishes the new stats/cents WITH the new codes") {
    import graft.land.AtomicLanding
    val p = freshPath()
    SemDedupState.buildSaved(e.filter(col("vec_id") < 30), p, nLists = 8)
    // drift rebuild over the full corpus CRASHES between its member
    // commits and the root swing — live stats/cents/codes all ran ahead
    intercept[RuntimeException] {
      SemDedupState.buildSaved(e, p, nLists = 8,
        beforeRootSwing = () => throw new RuntimeException("crash pre-swing"))
    }
    assert(SemDedupState.verdictsSaved(spark, p, 0.9).count() == 30,
      "readers stay on the OLD generation after the crashed rebuild")
    // the next append must NOT publish old stats/cents over the rebuilt
    // codes (rows coded under the new envelope joined to the old
    // quantizer — silent corruption); it heals to the NEW generation
    // and lands on top of it
    val batch = pert(e.filter(col("vec_id") < 10), 10000, 1.01)
    SemDedupState.addToSaved(spark, p, batch)
    val n = e.count()
    val out = SemDedupState.verdictsSaved(spark, p, 0.9)
    assert(out.count() == n + 10,
      "healed to the rebuilt corpus plus the appended batch")
    // the planted copies dup against their originals — only true if the
    // batch was quantized with the HEALED (new) stats/cents
    val dups = out.where(!col("kept") && col("vec_id") >= 10000)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(dups == (0L until 10L).map(_ + 10000).toSet,
      s"batch copies must witness under the healed generation (got $dups)")
  }
}
