package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Scale-curve probe for [[graft.ext.SemDedup]] — adjudicates the
  * operator's documented cost model before it is trusted at scale.
  *
  * SemDeDup's two terms are assignment O(n · L · d) and within-cluster
  * pairwise O(n²/L · d); balancing them gives L = sqrt(n) and total
  * O(n^1.5 · d) — the paper's own trade (at web scale the assignment
  * term moves onto an ANN index like [[graft.ext.Ivf]]; the verdict
  * pass stays the same). This probe times the operator at n and 10n
  * under sqrt sizing and reports the wall ratio against the n^1.5
  * model (10× data → ≤ ~31.6× kernel bound; fixed overheads pull the
  * measured ratio below it at these sizes).
  *
  * Replication decorrelates: each replica's vectors get a deterministic
  * per-(replica, dim) SIGN FLIP (xxhash64 parity), so replicas are
  * near-orthogonal instead of planted duplicates — identical copies
  * would pile every replica into one cluster and measure the wrong
  * workload (the same reason ScaleBench word-tags replicated text).
  * Each replica then plants 1% true scaled copies so the dup yield
  * stays non-trivial and is ASSERTED (yield must scale with n).
  *
  * Usage: runMain graft.SemDedupProbe [baseDir] [reps]  (default
  * /root/testdata/sf0.1, 10)
  */
object SemDedupProbe {
  def main(a: Array[String]): Unit = {
    val base = a.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (a.length > 1) a(1).toInt else 10
    val spark = Sessions.build(Sessions.cpusFromEnv, "semdedup-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val e0 = spark.read.parquet(s"$base/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n0 = e0.count()

    def corpus(r: Int): org.apache.spark.sql.DataFrame = {
      val rep = spark.range(r).toDF("rep")
      val flipped = rep.crossJoin(e0)
        .select((col("vec_id") + col("rep") * n0).as("vec_id"),
          // per-(rep, dim) deterministic sign: replicas decorrelate
          expr("""transform(embedding, (x, i) ->
                   CASE WHEN pmod(xxhash64(rep * 64 + i), 2) = 0
                        THEN x ELSE -x END)""").as("embedding"))
      val pert = flipped.where(pmod(col("vec_id"), lit(100)) === 0)
        .select((col("vec_id") + lit(1000000000L)).as("vec_id"),
          transform(col("embedding"),
            x => (x.cast("double") * lit(1.01d)).cast("float")).as("embedding"))
      flipped.unionByName(pert)
    }

    def t(f: => Long): (Double, Long) = {
      val s = System.nanoTime; val r = f
      ((System.nanoTime - s) / 1e9, r)
    }

    val legs = Seq(1, reps).map { r =>
      // spool so generation cost never rides the timed pass
      val dir = s"/tmp/graft_semdedup_${r}x_" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(base).toLong & 0xffffffffL)
      if (!new java.io.File(dir).exists())
        corpus(r).write.mode(SaveMode.Overwrite).parquet(dir)
      val c = spark.read.parquet(dir)
      val n = c.count()
      val nLists = math.max(16, math.sqrt(n.toDouble).toInt)
      val (wCold, _) = t(graft.ext.SemDedup.dedup(c, nLists, 0.9).count())
      val (wall, rows) = t(graft.ext.SemDedup.dedup(c, nLists, 0.9).count())
      val dups = graft.ext.SemDedup.dedup(c, nLists, 0.9)
        .where(!col("kept")).count()
      require(dups >= n / 101 / 2,
        s"dup yield must scale with the corpus: $dups dups at n=$n")
      println(f"""LEG {"scale":$r,"n":$n,"n_lists":$nLists,""" +
        f""""cold_sec":$wCold%.2f,"warm_sec":$wall%.2f,""" +
        f""""rows":$rows,"n_dups":$dups}""")
      (r, n, nLists, wall, dups)
    }
    val (r1, r2) = (legs.head, legs.last)
    val ratio = r2._4 / r1._4
    val bound = math.pow(r2._2.toDouble / r1._2, 1.5)
    println(f"""SUMMARY {"wall_ratio":$ratio%.2f,""" +
      f""""n_pow_1_5_bound":$bound%.2f,""" +
      f""""within_model":${ratio <= bound}}""")

    // ---- COMPOSED legs (VERDICT r19 item 1): the verdict pass riding
    // the PERSISTED IVF index the ingest pipeline maintains
    // (SemDedup.dedupWithIndex) — assignment comes from the index's
    // lists member, so the pass pays only the quantization scan + the
    // within-cluster pairwise term. Index build time is reported but
    // NOT part of the timed pass (the pipeline amortizes it across
    // every ANN probe + dedup sweep it serves). Expect the composed
    // wall to undercut the standalone wall at the same scale — the
    // assignment term visibly gone. ----
    val composed = Seq(1, reps).map { r =>
      val dir = s"/tmp/graft_semdedup_${r}x_" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(base).toLong & 0xffffffffL)
      val c = spark.read.parquet(dir)
      val n = c.count()
      val nLists = math.max(16, math.sqrt(n.toDouble).toInt)
      val idxDir = s"${dir}_ivfidx"
      val (tBuild, _) = t {
        if (!new java.io.File(idxDir).exists())
          graft.ext.Ivf.buildSavedIndex(c, idxDir, nLists = nLists, iters = 0)
        0L
      }
      val (wCold, _) = t(graft.ext.SemDedup.dedupWithIndex(c, idxDir, 0.9).count())
      val (wall, rows) = t(graft.ext.SemDedup.dedupWithIndex(c, idxDir, 0.9).count())
      println(f"""LEG_IVF {"scale":$r,"n":$n,"n_lists":$nLists,""" +
        f""""index_build_sec":$tBuild%.2f,"cold_sec":$wCold%.2f,""" +
        f""""warm_sec":$wall%.2f,"rows":$rows}""")
      (r, n, wall)
    }
    val cRatio = composed.last._3 / composed.head._3
    println(f"""SUMMARY_IVF {"wall_ratio":$cRatio%.2f,""" +
      f""""standalone_wall_ratio":$ratio%.2f,""" +
      f""""composed_vs_standalone_at_scale":${composed.last._3 / r2._4}%.2f}""")

    // ---- INCREMENTAL legs (VERDICT r19 item 2): a FIXED-size batch
    // verdicted against the persisted SemDedupState as the corpus grows
    // — the daily-pipeline shape. Cost model: one batch-sized quantize
    // (flat) + batch x same-cluster standing members; at L = sqrt(n)
    // sizing the cluster term grows ~sqrt(n), so the 10x corpus bound
    // is ~sqrt(10) = 3.16x, NOT 10x — the claim this leg adjudicates.
    // (State build time reported, not timed: built once, amortized.) ----
    val incr = Seq(1, reps).map { r =>
      val dir = s"/tmp/graft_semdedup_${r}x_" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(base).toLong & 0xffffffffL)
      val c = spark.read.parquet(dir)
      val n = c.count()
      val nLists = math.max(16, math.sqrt(n.toDouble).toInt)
      val stDir = s"${dir}_semstate"
      val (tBuild, _) = t {
        if (!new java.io.File(stDir).exists())
          graft.ext.SemDedupState.buildSaved(c, stDir, nLists = nLists)
        0L
      }
      // fixed batch at BOTH scales: 1.02x-scaled copies of the CORPUS's
      // first n0/10 vectors (rep 0's rows, identical in every replica
      // set — scaling must start from the spooled corpus, whose rep-0
      // vectors carry the decorrelating sign flip, or the batch matches
      // nothing and the dup-yield assertion below is vacuous)
      val batch = c.where(col("vec_id") < n0 / 10)
        .select((col("vec_id") + 2000000000L).as("vec_id"),
          transform(col("embedding"),
            x => (x.cast("double") * lit(1.02d)).cast("float")).as("embedding"))
        .localCheckpoint(true)
      val (wCold, _) = t(
        graft.ext.SemDedupState.dedupBatch(spark, stDir, batch, 0.9).count())
      val (wall, rows) = t(
        graft.ext.SemDedupState.dedupBatch(spark, stDir, batch, 0.9).count())
      val dups = graft.ext.SemDedupState.dedupBatch(spark, stDir, batch, 0.9)
        .where(!col("kept")).count()
      require(dups > 0, s"batch dups must witness against the corpus: $dups")
      println(f"""LEG_INCR {"scale":$r,"n_corpus":$n,"n_batch":${batch.count()},""" +
        f""""n_lists":$nLists,"state_build_sec":$tBuild%.2f,""" +
        f""""cold_sec":$wCold%.2f,"warm_sec":$wall%.2f,""" +
        f""""rows":$rows,"n_dups":$dups}""")
      (r, n, wall)
    }
    val iRatio = incr.last._3 / incr.head._3
    val iBound = math.sqrt(incr.last._2.toDouble / incr.head._2)
    println(f"""SUMMARY_INCR {"wall_ratio":$iRatio%.2f,""" +
      f""""sqrt_n_bound":$iBound%.2f,"flat_quantize_term":true,""" +
      f""""within_model":${iRatio <= iBound * 1.5}}""")

    // ---- DRIFT-PROBE legs (VERDICT r19 item 2): the detector that
    // decides WHEN the frozen-quantizer state rebuilds
    // ([[graft.ext.SemDedupState.driftProbe]]) must itself cost flat
    // in the corpus — it reads at most maxDirs tail dirs capped at
    // rowsPerDir rows each, never a corpus scan. Timed against the
    // states the incremental legs built; the same legs adjudicate the
    // DECISION: an undrifted (self-seeded) state must report a clamp
    // rate under the rebuild threshold at every scale. ----
    val drift = Seq(1, reps).map { r =>
      val dir = s"/tmp/graft_semdedup_${r}x_" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(base).toLong & 0xffffffffL)
      val n = spark.read.parquet(dir).count()
      val stDir = s"${dir}_semstate"
      graft.ext.SemDedupState.driftProbe(spark, stDir) // warm-up
      val t0 = System.nanoTime
      val ds = graft.ext.SemDedupState.driftProbe(spark, stDir)
      val wall = (System.nanoTime - t0) / 1e9
      require(ds.clampRate < 0.05,
        s"a self-seeded state must probe undrifted: $ds")
      println(f"""LEG_DRIFT {"scale":$r,"n_corpus":$n,""" +
        f""""warm_sec":$wall%.3f,"clamp_rate":${ds.clampRate}%.5f,""" +
        f""""occ_skew":${ds.occSkew}%.2f,"probed_rows":${ds.probedRows},""" +
        f""""probed_dirs":${ds.probedDirs},"total_dirs":${ds.totalDirs}}""")
      (r, n, wall)
    }
    val dRatio = drift.last._3 / drift.head._3
    println(f"""SUMMARY_DRIFT {"probe_wall_ratio":$dRatio%.2f,""" +
      f""""corpus_ratio":${drift.last._2.toDouble / drift.head._2}%.1f,""" +
      f""""flat_in_corpus":${dRatio <= 2.0}}""")
    spark.stop(); sys.exit(0)
  }
}
