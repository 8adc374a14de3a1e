package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.land.AtomicLanding

/** The PERSISTED semantic-dedup state — [[SemDedup]]'s quantized codes
  * and cluster assignment as a growable ACID artifact, the seventh
  * index lifecycle in the engine (after the fuzzy-signature, BM25, IVF,
  * IVF-PQ, cluster-state and decontamination-reference tiers, all of
  * which build / append / stream / probe the same way).
  *
  * Why persist at all: [[SemDedup.dedup]] and [[SemDedup.dedupWithIndex]]
  * re-quantize the WHOLE corpus every pass — fine for a one-shot
  * curation sweep, wrong for the daily shape where a 100 TB corpus
  * stands and batches arrive. The state freezes the expensive corpus
  * passes into three [[AtomicLanding]] members under one linked root:
  *
  *  - `stats`  — per-dimension (pos, mn, mx) from the SEED corpus: the
  *    frozen scalar quantizer ([[Quantize.int8CodesWith]]). Frozen is
  *    what makes growth order-independent: every batch codes against
  *    the same envelope, so a grown state is bit-identical to a
  *    one-shot build with the same seed (out-of-envelope batch values
  *    clamp to the int8 boundary — deterministic either way).
  *  - `cents`  — (cid, cvec, cn2): the first `nLists` SEED code vectors
  *    ([[SemDedup.seedCents]], the IVF iters = 0 discipline). Frozen
  *    for the same reason.
  *  - `codes`  — (vec_id, cid, codes, n2): the coded + assigned corpus,
  *    the only member that grows. Appends ride the per-writer
  *    batch-id idempotence channel, so an at-least-once streaming
  *    ingest replaying a committed micro-batch heals the root with
  *    ZERO code reads ([[graft.ext.Ivf.addToSavedIndex]]'s contract).
  *
  * Scale census: a batch append costs one batch-sized quantize + one
  * bounded cents broadcast + one batch-keyed argmax window — FLAT in
  * the corpus. [[dedupBatch]] (the incremental verdict) joins the batch
  * against ONLY its clusters' standing members — the corpus never
  * self-joins and standing verdicts are never recomputed, the
  * batch-vs-corpus shape every other dedup tier gates
  * ([[Dedup.minhashNearDupPairsAgainst]]). [[verdictsSaved]] (the full
  * sweep) pays only the within-cluster pairwise term — quantization and
  * assignment are already durable.
  */
object SemDedupState {

  /** Freeze stats + centroids from `emb` (the seed corpus), code and
    * assign it, and publish the three members under one root. `batchId`
    * is the seed watermark ([[graft.ext.Ivf.buildSavedIndex]] note): a
    * streaming ingest whose engine ids start at 0 seeds with -1. */
  def buildSaved(emb: DataFrame, path: String, nLists: Int,
      batchId: Option[Long] = None,
      beforeRootSwing: () => Unit = () => ()): String = {
    val stats = Quantize.dimStats(emb).localCheckpoint(true)
    val withN2 = coded(emb, stats)
    val cents = SemDedup.seedCents(withN2, nLists)
    val sv = AtomicLanding.commit(stats.coalesce(1), s"$path/stats")
    val cv = AtomicLanding.commit(cents.coalesce(1), s"$path/cents")
    val kv = AtomicLanding.commit(
      SemDedup.assignToCodeCents(withN2, cents), s"$path/codes",
      batchId = batchId)
    AtomicLanding.publishLinked(path,
      Map("stats" -> sv, "cents" -> cv, "codes" -> kv),
      expectedRoot = AtomicLanding.currentRootVersion(path),
      beforePublish = beforeRootSwing)
    path
  }

  private def coded(emb: DataFrame, stats: DataFrame): DataFrame =
    Quantize.int8CodesWith(emb, stats).localCheckpoint(true)
      .select(col("vec_id"), col("codes"),
        SemDedup.intDot(col("codes"), col("codes")).as("n2"))

  private def snapOf(path: String): AtomicLanding.LinkedSnapshot =
    AtomicLanding.linkedSnapshot(path).getOrElse(
      throw new IllegalStateException(s"no semantic-dedup state at $path"))

  private def member(spark: SparkSession, path: String,
      snap: AtomicLanding.LinkedSnapshot, m: String): DataFrame =
    AtomicLanding.readVersion(spark, s"$path/$m", snap.members(m))

  /** Quantize `batch` with the FROZEN stats and assign it against the
    * FROZEN centroids — the batch-sized pass both [[addToSaved]] and
    * [[dedupBatch]] share. */
  private def assignBatch(spark: SparkSession, path: String,
      snap: AtomicLanding.LinkedSnapshot, batch: DataFrame): DataFrame =
    SemDedup.assignToCodeCents(
      coded(batch, member(spark, path, snap, "stats")),
      member(spark, path, snap, "cents"))

  /** Append a batch of vectors to the persisted codes — quantized with
    * the frozen stats, assigned against the frozen centroids, committed
    * under the `writer` channel's batch-id watermark. The replay ladder
    * is [[graft.ext.Ivf.addToSavedIndex]]'s: a known-committed id heals
    * the root with no reads; a known-new id skips the O(state) dedupe
    * anti-join; an id-less append pays the anti-join. Vec ids are
    * immutable-by-contract (re-submitting a vec_id with a different
    * embedding is undefined — the engine-wide persisted-index rule). */
  def addToSaved(spark: SparkSession, path: String, batch: DataFrame,
      batchId: Option[Long] = None,
      beforePublish: () => Unit = () => (),
      beforeRootPublish: () => Unit = () => (),
      writer: String = ""): Unit = {
    val codesT = s"$path/codes"
    var done = false
    while (!done) {
      val snap = snapOf(path)
      if (batchId.exists(b =>
          AtomicLanding.lastBatchId(codesT, writer).exists(_ >= b))) {
        val kLive = AtomicLanding.currentVersion(codesT).get
        if (kLive == snap.members("codes")) done = true
        else done = healForward(path, snap, beforeRootPublish)
      } else if (AtomicLanding.currentVersion(codesT).get
          != snap.members("codes")) {
        // a predecessor crashed between its commits and the root swing
        // — an append OR a drift rebuild ([[buildSaved]] at this path);
        // heal to a CONSISTENT generation first ([[healForward]] tells
        // the two apart by dir lineage), then land on top
        healForward(path, snap, beforeRootPublish); ()
      } else {
        val fresh = (batchId.filter(_ =>
            AtomicLanding.lastBatchId(codesT, writer).isDefined) match {
          case Some(_) => batch // identified + known-new: monotone ids
          case _ =>
            val standing = AtomicLanding.read(spark, codesT)
              .select(col("vec_id"))
            batch.join(standing, Seq("vec_id"), "left_anti")
        }).persist()
        try {
          val kNew =
            if (!fresh.isEmpty || batchId.isDefined)
              AtomicLanding.commit(assignBatch(spark, path, snap, fresh),
                codesT, append = true, beforePublish = beforePublish,
                batchId = batchId, writer = writer)
            else AtomicLanding.currentVersion(codesT).get
          if (kNew == snap.members("codes")) done = true
          else done = casRoot(path, snap, kNew, beforeRootPublish)
        } finally fresh.unpersist()
      }
    }
  }

  private def casRoot(path: String, snap: AtomicLanding.LinkedSnapshot,
      kNew: Long, beforeRootPublish: () => Unit = () => ()): Boolean =
    try {
      AtomicLanding.publishLinked(path,
        Map("stats" -> snap.members("stats"),
          "cents" -> snap.members("cents"), "codes" -> kNew),
        expectedRoot = Some(snap.rootVersion),
        beforePublish = beforeRootPublish)
      true
    } catch {
      case _: java.util.ConcurrentModificationException => false
    }

  /** Heal a committed-but-unpublished LIVE codes generation forward —
    * the [[graft.ext.Ivf]] healLive discipline, because the state has
    * TWO crash shapes to tell apart since [[buildSaved]]-at-path became
    * the documented drift rebuild:
    *  - an APPEND chain (live dirs ⊇ pinned dirs — a crashed
    *    [[addToSaved]] or a [[maintainSaved]] fold, rows coded under
    *    the PINNED stats/cents): publish live codes under the pinned
    *    quantizer — the plain [[casRoot]];
    *  - a REWRITE generation (disjoint dirs — a drift rebuild that
    *    crashed between its codes commit and the root swing, rows coded
    *    under NEW stats/cents): publish the live codes WITH the live
    *    stats/cents versions (under the one-maintainer contract only
    *    the same crashed rebuild can have advanced them). Publishing
    *    pinned stats over rebuilt codes would quantize batches with the
    *    old envelope and join them into the new chain — silently wrong
    *    verdicts and permanent corruption, the mixed generation the
    *    root protocol exists to prevent. */
  private def healForward(path: String, snap: AtomicLanding.LinkedSnapshot,
      beforeRootPublish: () => Unit = () => ()): Boolean = {
    val codesT = s"$path/codes"
    val kLive = AtomicLanding.currentVersion(codesT).get
    val pinnedDirs =
      AtomicLanding.dirsOfVersion(codesT, snap.members("codes")).toSet
    val liveDirs = AtomicLanding.dirsOfVersion(codesT, kLive).toSet
    if (pinnedDirs.subsetOf(liveDirs))
      casRoot(path, snap, kLive, beforeRootPublish)
    else
      try {
        AtomicLanding.publishLinked(path,
          Map("stats" -> AtomicLanding.currentVersion(s"$path/stats").get,
            "cents" -> AtomicLanding.currentVersion(s"$path/cents").get,
            "codes" -> kLive),
          expectedRoot = Some(snap.rootVersion),
          beforePublish = beforeRootPublish)
        true
      } catch {
        case _: java.util.ConcurrentModificationException => false
      }
  }

  /** State MAINTENANCE — the physical tail fold every persisted tier
    * carries ([[graft.ext.Ivf.maintainSavedIndex]]'s shape, simpler
    * because this state never rewrites: stats/cents are frozen for
    * life, so the live codes generation is always an append chain and
    * the heal is the plain forward CAS): a streaming ingest leaves one
    * small dir per micro-batch; fold the sub-`smallBytes` tail into one
    * dir ([[AtomicLanding.compactSmall]] — never rewrites the body),
    * re-pin the root, and vacuum superseded generations
    * (quiescence-guarded). The batch-id watermark survives the fold, so
    * replay-skip keeps working. One maintainer at a time; concurrent
    * reads and appends are safe. Returns reclaimed paths.
    *
    * DRIFT: when the corpus outgrows the seed distribution (the frozen
    * quantizer's routing decays), rebuild with [[buildSaved]] AT THE
    * SAME PATH — each member commits a fresh version and ONE root CAS
    * flips readers from the old generation to the new atomically
    * (spec'd); a crash mid-rebuild leaves the old generation live. */
  def maintainSaved(spark: SparkSession, path: String,
      smallBytes: Long = 64L * 1024 * 1024,
      reservationGraceMs: Long = 600000L,
      retainRootGenerations: Int = 0): Seq[String] = {
    val codesT = s"$path/codes"
    var done = false
    while (!done) {
      val snap = snapOf(path)
      val kLive = AtomicLanding.currentVersion(codesT).get
      if (kLive != snap.members("codes")) {
        healForward(path, snap); ()
      } else {
        val folded =
          try AtomicLanding.compactSmall(spark, codesT, smallBytes)
          catch {
            case _: java.util.ConcurrentModificationException =>
              AtomicLanding.currentVersion(codesT).get
          }
        if (folded == snap.members("codes")) done = true
        else done = casRoot(path, snap, folded)
      }
    }
    AtomicLanding.vacuumLinked(path, futureGraceMs = reservationGraceMs,
      retainRoots = retainRootGenerations)
  }

  /** The frozen quantizer stats at the current root — (pos, mn, mx),
    * the member a warm serving path passes into consumers that would
    * otherwise re-train per call ([[Rerank.rerank]]'s `vecStats`). */
  def statsSaved(spark: SparkSession, path: String): DataFrame = {
    val snap = snapOf(path)
    member(spark, path, snap, "stats")
  }

  /** Full-corpus verdicts at the current root — [[SemDedup.verdicts]]
    * over the PERSISTED assignment: no quantization, no assignment,
    * only the within-cluster pairwise term. With the frozen quantizer
    * the result is append-order-independent and identical to a one-shot
    * [[SemDedup.dedup]] whose quantizer saw only the seed. */
  def verdictsSaved(spark: SparkSession, path: String,
      tau: Double): DataFrame = {
    val snap = snapOf(path)
    SemDedup.verdicts(member(spark, path, snap, "codes"), tau)
  }

  /** INCREMENTAL semantic dedup — verdict an arriving batch against the
    * standing corpus WITHOUT re-verdicting the corpus (the shape a
    * daily pipeline runs; the semantic sibling of
    * [[Dedup.minhashNearDupPairsAgainst]]): the batch quantizes with
    * the frozen stats, assigns against the frozen centroids, and
    * pairwise-compares ONLY against its own clusters' standing members.
    * The corpus never self-joins and its verdicts are untouched (this
    * pass reads, never writes). A batch vector is a duplicate iff some
    * SAME-CLUSTER standing vector is within `tau`; `dup_of` records the
    * smallest standing witness (-1 when kept). Batch-internal pairs are
    * NOT scored — land kept batches via [[addToSaved]] and they become
    * standing witnesses for the next batch (the incremental contract
    * every other dedup tier carries). */
  def dedupBatch(spark: SparkSession, path: String, batch: DataFrame,
      tau: Double): DataFrame = {
    val snap = snapOf(path)
    // the batch assignment is referenced twice below (the dup join and
    // the final spine) — pin it once or the cents read, broadcast and
    // per-vector argmax window run twice per call (the Rerank pairs-pin
    // discipline; the batch is bounded by contract)
    val asn = assignBatch(spark, path, snap, batch).localCheckpoint(true)
    val standing = member(spark, path, snap, "codes")
      .select(col("cid"), col("vec_id").as("va"),
        col("codes").as("ca"), col("n2").as("na"))
    val dup = asn
      .select(col("cid"), col("vec_id").as("vb"),
        col("codes").as("cb"), col("n2").as("nb"))
      .join(standing, Seq("cid"))
      .where(SemDedup.qcos(SemDedup.intDot(col("ca"), col("cb")),
        col("na"), col("nb")) >= lit(tau))
      .groupBy(col("vb").as("vec_id"))
      .agg(min(col("va")).as("dup_witness"))
    asn.select(col("vec_id"), col("cid"))
      .join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(col("dup_witness"), lit(-1L)).as("dup_of"),
        col("dup_witness").isNull.as("kept"))
  }
}
