package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve evidence: generate an N× replica of an sf dir by
  * key-shifted replication, time headline relational + LLM-pipeline
  * queries at both scales, and print ONE JSON line with per-query
  * (base_sec, scaled_sec, ratio) plus the executed join strategies at
  * each scale — the direct check that a 10× scale-up keeps wall time
  * ~linear and flips no plan the wrong way (a broadcast that should
  * have been a shuffle shows up here as a super-linear ratio or an OOM,
  * a lost broadcast as a changed join census).
  *
  * Replication preserves join cardinality per replica: every foreign
  * key shifts by `i * (max(primary)+1)`, so replica i joins exactly and
  * only replica i — the scaled workload is N disjoint copies of the
  * base workload, the same shape a 10× bigger TPC-H dbgen would give
  * (dimension tables nation/region stay fixed, as in TPC-H). Document
  * text gets a per-replica word tag so the vocabulary scales too (the
  * dedup/text operators would otherwise see every replica as one giant
  * duplicate class, which quadratically inflates near-dup pairs instead
  * of scaling the real workload).
  *
  * Usage: runMain graft.ScaleBench [baseDir] [outDir] [replicas] [only]
  * (defaults /root/testdata/sf0.1 /tmp/graft_sf1 10; generation is
  * skipped when outDir already holds a completed replica set; `only` is
  * an optional comma-separated query-name filter for targeted probes —
  * a filtered run is a probe, not curve evidence).
  */
object ScaleBench {

  /** Queries timed at both scales: the TPC-H-shaped joins/aggs plus the
    * text/dedup pipeline rows the verdict called out. */
  val Headline: Seq[String] = Seq(
    "q_agg_pricing", "q_join_large", "q_tpch_order_priority",
    "q_tpch_local_supplier", "q_tpch_small_qty", "q_salted_agg",
    "q_window_running", "q_dedup_exact", "q_dedup_minhash",
    "q_text_stats", "q_top_terms", "q_collocations", "q_pack",
    "q_bm25", "q_bm25_indexed", "q_lm_score", "q_lm_score_frozen",
    "q_chunk", "q_chunk_spans", "q_bm25_selfjoin", "q_rerank",
    // the fused rerank stack (BM25 + brute cosine + RRF + LTR) and its
    // vec-featured variant: both first stages are corpus-linear scans,
    // the rerank tail is shortlist-bounded, and the vec variant adds
    // one quantization-stats pass over the embedding corpus; the
    // frozen-stats variant amortizes exactly that pass behind the
    // persisted state (its advantage should GROW with the corpus —
    // VERDICT r19 item 6), and the swapped-scorer row prices the
    // injectable seam (same plumbing, different formula)
    "q_rerank_hybrid", "q_rerank_vec", "q_rerank_vec_frozen",
    "q_rerank_swapped",
    // hard-negative mining: the brute baseline is corpus-linear per
    // anchor; the IVF-composed row must absorb the corpus growth in
    // its probed clusters
    "q_hard_negatives", "q_hard_negatives_ivf",
    "q_cms", "q_heavy_hitters",
    "q_cosine_topk", "q_cosine_ivf", "q_cosine_ivfpq",
    "q_pagerank", "q_retention", "q_funnel",
    // decontamination pair: corpus grows 100x, the benchmark side stays
    // 10 docs — the probe that prices the bloom prefilter's shuffle
    // savings against its build cost (base-scale bloom build dominates;
    // at scale the dropped corpus n-grams should pay for it)
    "q_decontaminate", "q_decontaminate_bloom",
    "q_outliers", "q_cms_join_size",
    "q_sessionize", "q_sessionize_chunked", "q_weighted_sample",
    // estimation rows: the weighted draw is a TakeOrderedAndProject
    // (global) / one stratum-partitioned window (stratified) over a
    // priority projection — expect ~corpus-linear scan cost with a
    // fixed-size result; the per-stratum variant re-uses ONE exchange
    "q_weighted_estimate", "q_weighted_stratified_estimate",
    // the GROWN BM25 index probe: built half + addToIndex half at
    // warm-up (per-dir spool), timed passes score the query batch
    // against the ACID index — must track q_bm25_indexed
    "q_bm25_grown",
    // the GROWN persisted IVF index probe: prefix build + two ACID
    // appends at warm-up (per-dir spool), timed passes probe the saved
    // snapshot — must track q_cosine_ivf minus its per-run build
    "q_cosine_ivf_grown")

  /** Extra curve rows that are NOT gate queries: the corpus-sized-output
    * gate rows minus their global ORDER BY. Those rows' 100× residual is
    * the sort + materialization of a corpus-sized result (the per-doc
    * work itself is map-side — see q_lang_id hitting the scan floor);
    * production pipelines aggregate or write unsorted (partition-local
    * order), and these rows measure that contract directly. */
  val Extra: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_text_stats_unsorted" -> ((s: SparkSession, dir: String) =>
      graft.ext.TextStats.stats(Tables.t(s, dir, "documents"))),
    "q_chunk_unsorted" -> ((s: SparkSession, dir: String) =>
      graft.ext.Chunking.chunk(Tables.t(s, dir, "documents"),
        chunk = 64, stride = 48)),
    "q_chunk_spans_unsorted" -> ((s: SparkSession, dir: String) =>
      graft.ext.Chunking.spans(Tables.t(s, dir, "documents"),
        chunk = 64, stride = 48)),
    // the q_fuzzy_join gate row reads c_name, which replication copies
    // verbatim (replica keys shift, name strings don't) — distinct()
    // would collapse the 100× input back to the base 1,500 names. This
    // row derives the identical 9-digit name from the SHIFTED custkey:
    // byte-for-byte the gate computation at base scale, a genuinely
    // 100×-larger name corpus at 100×.
    "q_fuzzy_names" -> ((s: SparkSession, dir: String) =>
      graft.ext.FuzzyJoin.selfJoinEd1(
        Tables.t(s, dir, "customer")
          .select(format_string("Customer#%09d", col("c_custkey")).as("name")),
        "name")),
    // the ed<=2 deletion-neighborhood join on the same derived corpus:
    // the signature table is ~L/2x the ed1 table's and the hot-bucket
    // candidate volume grows sub-linearly (FuzzyJoinSpec measures the
    // buckets; this row measures the wall-clock consequence)
    "q_fuzzy_names_ed2" -> ((s: SparkSession, dir: String) =>
      graft.ext.FuzzyJoin.selfJoinEdK(
        Tables.t(s, dir, "customer")
          .select(format_string("Customer#%09d", col("c_custkey")).as("name")),
        "name", k = 2)),
    // the same join under Valve.Auto — the advisor's VALUE measured:
    // the sequential-name corpus is the dense shape the census engages
    // on, so this row prices the sampled census + the capped join
    // against the exact row above, at both scales (probe via `only`,
    // like its exact sibling)
    "q_fuzzy_names_ed2_auto" -> ((s: SparkSession, dir: String) =>
      graft.ext.FuzzyJoin.selfJoinEdK(
        Tables.t(s, dir, "customer")
          .select(format_string("Customer#%09d", col("c_custkey")).as("name")),
        "name", k = 2,
        graft.ext.FuzzyJoin.Valve.Auto(sampleFraction = 0.25))),
    // hybrid retrieval AT CORPUS SCALE — the q_hybrid_rrf gate row with
    // the brute-force vector side swapped for IVF-PQ (built inline, the
    // q_cosine_ivfpq_selfjoin precedent) and the BM25 side carrying the
    // maxDf posting-list valve: both rankers keep their own 100-TB
    // paths, and the FUSED stage runs on |queries| x 40 rows however
    // big the corpus grows — the claim this row measures
    "q_hybrid_rrf_scaled" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.t(s, dir, "documents").select(col("doc_id"), col("text"))
      val e = Tables.t(s, dir, "embeddings")
      val qsT = Seq(
        (0L, "spark query engine"), (1L, "join filter window"),
        (2L, "customer order stream"), (3L, "table scan merge sort"))
        .toDF("query_id", "qtext")
      val textRank = graft.ext.Retrieval
        .bm25TopK(d, qsT, k = 20, maxDf = Some(3000L))
        .select(col("query_id"), col("doc_id").as("id"), col("rnk"))
      val vecRank = graft.ext.IvfPq
        .probe(e, graft.ext.IvfPq.buildIndex(e),
          e.filter(col("vec_id") < 4), k = 20, nProbe = 4, shortlist = 50)
        .select(col("query_id"), col("neighbor_id").as("id"), col("rnk"))
      graft.ext.Retrieval.rrfFuse(Seq(textRank, vecRank), k = 10)
    }),
    "q_entity_names" -> ((s: SparkSession, dir: String) =>
      // the SHARED gate pipeline (FuzzyJoin.entityComponents — the probe
      // cannot drift from the gated computation), with localSolveMax = 0
      // forcing the distributed star-contraction path at BOTH scales:
      // measuring the driver union-find against it would compare
      // different algorithms, not different data sizes
      graft.ext.FuzzyJoin.entityComponents(
          Tables.t(s, dir, "customer")
            .select(col("c_custkey"),
              format_string("Customer#%09d", col("c_custkey")).as("c_name")),
          keyCol = "c_name", idCol = "c_custkey", localSolveMax = 0L)
        .groupBy(col("component")).agg(count(lit(1)).as("n_members"))))

  private def span(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0) + 1L

  /** n copies; each listed key column shifts by i*span so replica i
    * joins only replica i. */
  private def replicate(df: DataFrame, n: Int, shifts: Map[String, Long]): DataFrame = {
    val withI = df.withColumn("_i", explode(sequence(lit(0L), lit(n - 1L))))
    shifts.foldLeft(withI) { case (d, (c, k)) =>
      d.withColumn(c, col(c) + col("_i") * lit(k))
    }
  }

  def generate(spark: SparkSession, base: String, out: String, n: Int): Unit = {
    def rd(t: String) = spark.read.parquet(s"$base/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.drop("_i").write.mode("overwrite").parquet(s"$out/$t.parquet")

    // skip is keyed on a completion marker written AFTER the last table —
    // keying on any individual table's existence would treat an
    // interrupted previous run as complete and silently bench against
    // missing or stale tables
    val marker = new java.io.File(s"$out/_GRAFT_COMPLETE")
    if (marker.exists()) return

    val e = rd("embeddings")
    // per-(replica, dimension) perturbation so replica vectors are
    // DIRECTIONALLY distinct (a pure scalar scale would leave cosine
    // = 1 across replicas and quadratically inflate near-dup classes
    // instead of scaling the corpus) — top-k rows stay well-posed
    wr(replicate(e, n, Map("vec_id" -> span(e, "vec_id")))
      .withColumn("embedding", transform(col("embedding"), (x, j) =>
        (x.cast("double") * (lit(1.0d) + col("_i").cast("double") * lit(1e-3d)
          * ((j % 7) + 1).cast("double"))).cast("float"))), "embeddings")

    val (ko, kp, ks, kc) = (span(rd("orders"), "o_orderkey"),
      span(rd("part"), "p_partkey"), span(rd("supplier"), "s_suppkey"),
      span(rd("customer"), "c_custkey"))
    wr(replicate(rd("lineitem"), n,
      Map("l_orderkey" -> ko, "l_partkey" -> kp, "l_suppkey" -> ks)), "lineitem")
    wr(replicate(rd("orders"), n,
      Map("o_orderkey" -> ko, "o_custkey" -> kc)), "orders")
    wr(replicate(rd("customer"), n, Map("c_custkey" -> kc)), "customer")
    wr(replicate(rd("supplier"), n, Map("s_suppkey" -> ks)), "supplier")
    wr(replicate(rd("part"), n, Map("p_partkey" -> kp)), "part")
    rd("nation").write.mode("overwrite").parquet(s"$out/nation.parquet")
    rd("region").write.mode("overwrite").parquet(s"$out/region.parquet")

    val docs = rd("documents")
    val kd = span(docs, "doc_id")
    // replica 0 keeps the original text; others word-tag so the corpus
    // (and its vocabulary) scales instead of replicating dup classes
    wr(replicate(docs, n, Map("doc_id" -> kd))
      .withColumn("text", when(col("_i") === 0L, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          w => concat(lit("r"), col("_i"), w)), " "))), "documents")

    // raw read on purpose: replication copies ts in whatever physical
    // type the fixture stores (Tables.events normalizes at query time)
    val ev = rd("events")
    wr(replicate(ev, n, Map(
      "event_id" -> span(ev, "event_id"), "user_id" -> span(ev, "user_id"))),
      "events")

    marker.createNewFile()
  }

  /** ACID tier curve — the batch manifest/pointer protocol's costs
    * MEASURED, not argued: a scaled `orders` body committed once, a
    * fixed-SIZE micro-batch append tail (the streaming shape: tail cost
    * must not grow with the body), a fraction-of-keys merge (snapshot
    * rewrite — linear in the body by design, per-partition pruning is
    * the named 100-TB refinement), tail-bounded compactSmall (folds the
    * 8 small dirs, never rewrites the body — THE sub-linear claim),
    * time travel back to the pre-compaction snapshot, and vacuum
    * (file-count-bounded). Emits one JSON object per scale. */
  private def acidSection(spark: SparkSession, dir: String,
      scratch: String): String = {
    import graft.land.AtomicLanding
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    val table = s"$scratch/acid_orders"
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      (((System.nanoTime() - t0) / 1e9), r)
    }
    val body = Tables.t(spark, dir, "orders")
    val keySpan = span(body, "o_orderkey")
    // range-clustered body: FOUR disjoint key-quarter dirs — the layout
    // streaming appends / clustered compactions produce, and the one
    // where file-level merge pruning has something to skip
    val q = keySpan / 4 + 1
    val (tInit, _) = time {
      AtomicLanding.commit(body.where(col("o_orderkey") < q), table)
      (1 to 3).foreach { i =>
        AtomicLanding.commit(
          body.where(col("o_orderkey") >= i * q &&
            col("o_orderkey") < (i + 1) * q), table, append = true)
      }
    }
    val (tMergePruned, _) = time {
      // same update density, confined to the FIRST quarter's key range:
      // the pruned merge must rewrite one dir of four — cost tracks the
      // touched data, not the table
      AtomicLanding.mergePruned(
        body.where(col("o_orderkey") < q &&
            pmod(col("o_orderkey"), lit(997)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.2),
        table, "o_orderkey")
    }
    val dirsAfterPruned = AtomicLanding.liveDirCount(table)
    val (tMerge, _) = time {
      // ~0.1% of keys across the WHOLE range — the snapshot rewrite
      AtomicLanding.merge(
        body.where(pmod(col("o_orderkey"), lit(997)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.1),
        table, "o_orderkey")
    }
    val (tAppend, _) = time {
      // 8 micro-batches of ~2000 FRESH rows each (keys shifted past the
      // body): the size of the streaming tail does not scale with the
      // table, and neither may its append cost. mod-71 residues hold
      // ~n/71 rows at every scale, so limit(2000) caps a non-empty
      // slice (a rarer residue would under-fill the batch at base)
      (1 to 8).foreach { i =>
        AtomicLanding.commit(
          body.where(pmod(col("o_orderkey"), lit(71)) === i).limit(2000)
            .withColumn("o_orderkey", col("o_orderkey") + lit(i * keySpan)),
          table, append = true)
      }
    }
    val dirsBefore = AtomicLanding.liveDirCount(table)
    val vPreCompact = AtomicLanding.currentVersion(table).get
    val (tCompact, _) = time(
      // threshold sits above any 2000-row tail dir (~60 KB) and below
      // the body dir at every scale (2.6 MB at sf0.1 base, 100x more
      // scaled), so exactly the tail folds
      AtomicLanding.compactSmall(spark, table, smallBytes = 512L * 1024))
    val dirsAfter = AtomicLanding.liveDirCount(table)
    val (tTravel, travelRows) = time(
      AtomicLanding.readVersion(spark, table, vPreCompact).count())
    val (tVacuum, removed) = time(AtomicLanding.vacuum(table))
    val (tRead, rows) = time(AtomicLanding.read(spark, table).count())
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    f"""{"init_commit_sec":$tInit%.3f,"merge_pruned_sec":$tMergePruned%.3f,""" +
      f""""dirs_after_pruned":$dirsAfterPruned,"merge_sec":$tMerge%.3f,""" +
      f""""append8_sec":$tAppend%.3f,"compact_small_sec":$tCompact%.3f,""" +
      f""""timetravel_sec":$tTravel%.3f,"vacuum_sec":$tVacuum%.3f,""" +
      f""""read_sec":$tRead%.3f,"dirs_before_compact":$dirsBefore,""" +
      f""""dirs_after_compact":$dirsAfter,"removed_paths":${removed.size},""" +
      f""""rows":$rows,"timetravel_rows":$travelRows}"""
  }

  /** Rebase + grown-index maintenance legs — the "O(updates), not
    * O(table)" claims MEASURED at two scales instead of argued:
    *
    *  - `rebase`: on a body+tail orders table, a fixed-size concurrent
    *    append lands INSIDE the compaction's pre-commit window (the
    *    `beforeCommit` seam — exactly a live streaming ingest racing
    *    maintenance), so the commit takes the rebase path and carries
    *    the batch into the compacted manifest. The tail and the ridden
    *    batch are fixed-size at every scale; the rebase reads manifests
    *    and the batch, never the body — so the timed fold+rebase wall
    *    must stay ~flat while the body grows 10×. Row conservation is
    *    require()d: a rebase that swallowed or duplicated the ridden
    *    batch fails the run, not just the curve.
    *  - `index_maint`: a BM25 index over the documents corpus grows by
    *    three fixed-size identified batches (batch-id fast path — no
    *    dedupe scan), then [[graft.ext.Retrieval.maintainIndex]] folds
    *    the tail and republishes the root. The fold touches the tail
    *    dirs plus the vocabulary-sized derived table; the corpus-sized
    *    postings body must never be re-read (`derivedRebuilds` delta
    *    require()d zero, body-dir survival require()d), so append and
    *    maintenance wall must track the tail, not the corpus — while
    *    `build_sec` (the one corpus-sized step, reported for contrast)
    *    scales with the table. */
  private def maintSection(spark: SparkSession, dir: String,
      scratch: String): String = {
    import graft.land.AtomicLanding
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      (((System.nanoTime() - t0) / 1e9), r)
    }

    // ---- leg 1: concurrent append riding the compaction rebase ----
    val table = s"$scratch/orders_tail"
    val body = Tables.t(spark, dir, "orders")
    val keySpan = span(body, "o_orderkey")
    AtomicLanding.commit(body, table)
    (1 to 8).foreach { i =>
      AtomicLanding.commit(
        body.where(pmod(col("o_orderkey"), lit(71)) === i).limit(2000)
          .withColumn("o_orderkey", col("o_orderkey") + lit(i * keySpan)),
        table, append = true)
    }
    val rowsBefore = AtomicLanding.read(spark, table).count()
    // the ridden batch is staged eagerly OUTSIDE the timer: the timed
    // section is the fold + the concurrent commit + the rebase, not
    // the batch's own lineage
    val ride = body.where(pmod(col("o_orderkey"), lit(71)) === 9).limit(2000)
      .withColumn("o_orderkey", col("o_orderkey") + lit(9L * keySpan))
      .localCheckpoint()
    val rideRows = ride.count()
    // scale-proof threshold: just under the BODY dir's size, so exactly
    // the fixed-size tail folds at every scale factor
    def maxDirBytes(t: String): Long =
      AtomicLanding.dirsOfVersion(t, AtomicLanding.currentVersion(t).get)
        .map(d => fs.getContentSummary(
          new org.apache.hadoop.fs.Path(s"$t/$d")).getLength).max
    val (tRebase, comp) = time {
      AtomicLanding.compactSmallFrom(spark, table,
        smallBytes = maxDirBytes(table) - 1,
        beforeCommit = () =>
          { AtomicLanding.commit(ride, table, append = true); () })
    }
    require(comp.foldDir.nonEmpty, "the tail must have folded")
    val rowsAfter = AtomicLanding.read(spark, table).count()
    require(rowsAfter == rowsBefore + rideRows,
      s"rebase must conserve rows: $rowsBefore + $rideRows != $rowsAfter")
    val rideDirs = AtomicLanding.liveDirCount(table)

    // ---- leg 2: grown BM25 index maintenance ----
    val idx = s"$scratch/bm25idx"
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val dSpan = span(docs, "doc_id")
    val (tBuild, _) = time(graft.ext.Retrieval.buildIndex(docs, idx,
      batchId = Some(0L)))
    // fixed-size batches from the base-scale head (replica 0 keeps the
    // original text), shifted to fresh ids: identical batch content at
    // every scale
    val batchSrc = docs.orderBy(col("doc_id")).limit(300).localCheckpoint()
    val (tAppend, _) = time {
      (1 to 3).foreach { i =>
        graft.ext.Retrieval.addToIndex(spark, idx,
          batchSrc.withColumn("doc_id", col("doc_id") + lit(i * dSpan)),
          batchId = Some(i.toLong)); ()
      }
    }
    val bodyDirs = AtomicLanding.liveDirCount(s"$idx/postings")
    require(bodyDirs == 4, s"expected body + 3 tail dirs, got $bodyDirs")
    val rebuilds0 = graft.ext.Retrieval.derivedRebuilds.get()
    val (tMaint, removed) = time(
      graft.ext.Retrieval.maintainIndex(spark, idx,
        smallBytes = maxDirBytes(s"$idx/postings") - 1))
    require(graft.ext.Retrieval.derivedRebuilds.get() == rebuilds0,
      "maintenance must never pay the O(index) derived rebuild")
    val dirsAfterMaint = AtomicLanding.liveDirCount(s"$idx/postings")
    require(dirsAfterMaint == 2,
      s"the fold must leave body + folded tail, got $dirsAfterMaint " +
        "(threshold misfit: the corpus body dir folded, or the tail did not)")

    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    f"""{"rebase_sec":$tRebase%.3f,"ride_rows":$rideRows,""" +
      f""""dirs_after_rebase":$rideDirs,"index_build_sec":$tBuild%.3f,""" +
      f""""index_append3_sec":$tAppend%.3f,"index_maint_sec":$tMaint%.3f,""" +
      f""""maint_removed_paths":${removed.size},"derived_rebuilds":0}"""
  }

  /** Incremental clustering at scale — the [[graft.ext.Clusters]] leg:
    * a corpus-scaled standing state (the [[ccSection]] chain graph:
    * components of 100 whose COUNT grows with the corpus) takes a
    * FIXED batch — 50 chain-pair merges + 100 first-seen pairs. The
    * claim under the clock: an append is a batch-sized contraction
    * plus three filtered passes over the state (extendDeltaRaw's
    * scaladoc) — no state-wide shuffle, no re-cluster — so
    * `append_sec` must track the batch while `build_sec` (the one
    * corpus-sized step) scales with the corpus. Exactness is
    * require()d structurally: the delta is exactly 5,200 rows (100
    * members × 50 dissolved chains + 200 fresh) at EVERY scale, and a
    * probed member of a dissolved chain resolves to the merged root. */
  private def clustersSection(spark: SparkSession, dir: String,
      scratch: String): String = {
    import graft.land.AtomicLanding
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      (((System.nanoTime() - t0) / 1e9), r)
    }
    val state = s"$scratch/clusters"
    val standing = Tables.t(spark, dir, "customer")
      .select(col("c_custkey").as("doc_a"))
      .where(pmod(col("doc_a"), lit(100L)) =!= 0L)
      .withColumn("doc_b", col("doc_a") + 1L)
    val (tBuild, _) = time(graft.ext.Clusters.buildSaved(standing, state))
    val rows0 = AtomicLanding.read(spark, state).count()
    // fixed batch, staged outside the timer: merge chains (2i, 2i+1)
    // for i < 50 at member offset 50, plus 100 pairs of unseen ids far
    // above any replica's keyspan
    val spark2 = spark; import spark2.implicits._
    val batch = ((0 until 50).map(i =>
        (200L * i + 50L, 200L * i + 150L)) ++
      (0 until 100).map(j =>
        (4000000000000L + 2 * j, 4000000000000L + 2 * j + 1)))
      .toDF("doc_a", "doc_b").localCheckpoint()
    val (tAppend, _) = time(
      graft.ext.Clusters.addToSaved(spark, state, batch, batchId = Some(1L)))
    val deltaRows = AtomicLanding.read(spark, state).count() - rows0
    require(deltaRows == 5200L,
      s"append must write exactly the affected rows (5200), got $deltaRows")
    // chain 3 ([301,400], root 301) dissolved into chain 2's root 201
    val probe = graft.ext.Clusters.snapshot(spark, state)
      .where(col("doc_id") === 350L).head().getAs[Long]("component")
    require(probe == 201L, s"member 350 must resolve to merged root 201, got $probe")
    val (tFold, _) = time(graft.ext.Clusters.maintainSaved(spark, state))
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    f"""{"build_sec":$tBuild%.3f,"state_rows":$rows0,""" +
      f""""append_sec":$tAppend%.3f,"delta_rows":$deltaRows,""" +
      f""""fold_sec":$tFold%.3f}"""
  }

  /** IVF major maintenance at scale — the
    * [[graft.ext.Ivf.rebalanceSavedIndex]] leg: a saved index over the
    * full embeddings corpus takes three FIXED identified appends
    * (base-corpus head, shifted to fresh ids), then a full re-seed
    * rebalance. Claims under the clock: appends track the BATCH (flat
    * across scales — the batch-id fast path plus one batch-sized
    * assign); the rebalance is the one corpus-sized maintenance step
    * (retrain + reassign + CAS'd lists rewrite) and must stay
    * build-shaped — it scales with the corpus like `build_sec`, never
    * super-linearly past it. Row conservation through the rewrite, a
    * fresh root pin, and probe sanity (every self-probe's top-1 at
    * cosine ~1) are require()d at both scales. */
  private def ivfRebalSection(spark: SparkSession, dir: String,
      scratch: String): String = {
    import graft.land.AtomicLanding
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      (((System.nanoTime() - t0) / 1e9), r)
    }
    val idx = s"$scratch/ivfidx"
    val e = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val vSpan = span(e, "vec_id")
    val (tBuild, _) = time(
      graft.ext.Ivf.buildSavedIndex(e, idx, nLists = 16, iters = 0,
        batchId = Some(0L)))
    val rows0 = AtomicLanding.read(spark, s"$idx/lists").count()
    // fixed-size batches from the base-scale head (replica 0 keeps the
    // original vectors), shifted to fresh ids: identical batch content
    // at every scale
    val batchSrc = e.orderBy(col("vec_id")).limit(200).localCheckpoint()
    val (tAppend, _) = time {
      (1 to 3).foreach { i =>
        graft.ext.Ivf.addToSavedIndex(spark, idx,
          batchSrc.select((col("vec_id") + lit(i * vSpan)).as("vec_id"),
            col("embedding")),
          batchId = Some(i.toLong)); ()
      }
    }
    val rowsGrown = AtomicLanding.read(spark, s"$idx/lists").count()
    require(rowsGrown == rows0 + 600,
      s"appends must add exactly the batch rows: $rows0 + 600 != $rowsGrown")
    val root0 = AtomicLanding.currentRootVersion(idx).get
    // NO-DRIFT leg: the appends carry HIGHER ids, so retraining
    // reproduces the live quantizer — the drift probe must skip the
    // corpus-sized rewrite entirely (r16: the conditional-rebalance
    // contract) and this leg prices exactly that probe
    val skips0 = graft.ext.Ivf.rebalanceSkips.get()
    val (tNoDrift, _) = time(
      graft.ext.Ivf.rebalanceSavedIndex(spark, idx, nLists = 16, iters = 0))
    require(graft.ext.Ivf.rebalanceSkips.get() == skips0 + 1 &&
      AtomicLanding.currentRootVersion(idx).contains(root0),
      "a no-drift rebalance must skip and publish nothing")
    // DRIFTED leg: a batch BELOW the id floor changes the canonical
    // seed prefix, so the rebuild must run — the legacy measurement
    graft.ext.Ivf.addToSavedIndex(spark, idx,
      batchSrc.select((col("vec_id") - lit(vSpan)).as("vec_id"),
        col("embedding")),
      batchId = Some(4L))
    val (tRebal, _) = time(
      graft.ext.Ivf.rebalanceSavedIndex(spark, idx, nLists = 16, iters = 0))
    require(AtomicLanding.currentRootVersion(idx).exists(_ > root0),
      "a drifted rebalance must publish a fresh root generation")
    val rowsRebal = AtomicLanding.read(spark, s"$idx/lists").count()
    require(rowsRebal == rowsGrown + 200,
      s"the rewrite must conserve rows: $rowsGrown + 200 != $rowsRebal")
    val selfTop = graft.ext.Ivf.probeSavedIndex(spark, idx,
        e.filter(col("vec_id") < 4), k = 1, nProbe = 4)
      .select(col("cos_sim")).collect().map(_.getDouble(0))
    require(selfTop.length == 4 && selfTop.forall(_ >= 0.999),
      s"self-probe top-1 must score ~1 after the rebalance, got ${selfTop.mkString(",")}")
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    f"""{"build_sec":$tBuild%.3f,"lists_rows":$rows0,""" +
      f""""append3_sec":$tAppend%.3f,"rebalance_nodrift_sec":$tNoDrift%.3f,""" +
      f""""rebalance_sec":$tRebal%.3f}"""
  }

  /** File-pruned row-level delete at scale — the
    * [[graft.land.AtomicLanding.deletePruned]] leg on a
    * range-clustered table (4 corpus-sized key segments + one FIXED
    * 2000-row appended tail). The timed rows tell the whole cost
    * story: the shallow clone and the provable no-op delete (ghost
    * keys outside every range) are manifest-only — FLAT; the
    * manifest-pruned tail read and the tail-confined delete touch one
    * fixed dir — FLAT while the 4 body segments grow 100×; victims
    * inside a body segment rewrite that segment — corpus-shaped, the
    * honest contrast. Row conservation and the carried-dir layout are
    * require()d at both scales. */
  /** INCREMENTAL decontamination at scale — the r16 answer to
    * DECON_PROBE_r15's scan-bound 70×: the benchmark shingle index
    * builds ONCE (benchmark-sized — the fixed replica-0 head at every
    * scale), and each batch probe costs the BATCH, never the corpus.
    * `inline_full_sec` re-prices the r15 inline path on the same dir
    * as the honest contrast: THAT is what grows with the corpus. */
  private def deconIncSection(spark: SparkSession, dir: String,
      scratch: String): String = {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      (((System.nanoTime() - t0) / 1e9), r)
    }
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val bench = docs.filter(col("doc_id") < 10)
    val idx = s"$scratch/deconidx"
    val (tBuild, _) = time(
      graft.ext.Decontaminate.buildBenchIndex(bench, idx,
        batchId = Some(0L)))
    // three fixed 300-doc batches from the base-scale head: identical
    // batch content at every scale
    val batches = (0 until 3).map(i => docs
      .filter(col("doc_id") >= 10 + i * 300 && col("doc_id") < 10 + (i + 1) * 300)
      .localCheckpoint())
    val (tProbe3, flagged) = time(batches.map(b =>
      graft.ext.Decontaminate.overlapsIncremental(spark, idx, b,
        minShared = 10).count()).sum)
    val (tInline, inlineRows) = time(graft.ext.Decontaminate.overlaps(
      docs.filter(col("doc_id") >= 10), bench, minShared = 10).count())
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    f"""{"build_sec":$tBuild%.3f,"probe3_sec":$tProbe3%.3f,""" +
      f""""flagged":$flagged,"inline_full_sec":$tInline%.3f,""" +
      f""""inline_rows":$inlineRows}"""
  }

  /** MULTI-WRITER stress — the r16 leg racing the CAS protocols at
    * scale instead of only in specs: four parallel identified
    * appenders and one concurrent DRIFTED rebalance on one saved IVF
    * index. Every batch id must land exactly once (zero lost batches),
    * the final root must resolve a consistent pair, and the lists must
    * hold every vector exactly once — under real corpus sizes, where
    * the rebalance's rewrite window is seconds wide. */
  private def multiWriterSection(spark: SparkSession, dir: String,
      scratch: String): String = {
    import graft.land.AtomicLanding
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      (((System.nanoTime() - t0) / 1e9), r)
    }
    val idx = s"$scratch/mwidx"
    val e = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val vSpan = span(e, "vec_id")
    graft.ext.Ivf.buildSavedIndex(e, idx, nLists = 16, iters = 0,
      batchId = Some(0L))
    val batchSrc = e.orderBy(col("vec_id")).limit(200).localCheckpoint()
    // batch 1 sits BELOW the id floor so the racing rebalance is
    // genuinely drifted (a skip would race nothing)
    val batches = (1 to 5).map { i =>
      val shift = if (i == 1) -vSpan else i * vSpan
      i.toLong -> batchSrc
        .select((col("vec_id") + lit(shift)).as("vec_id"),
          col("embedding")).localCheckpoint()
    }
    AtomicLanding.currentRootVersion(idx).get
    val retries0 = graft.ext.Ivf.rebalanceSkips.get() // touch counters
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // each appender is an INDEPENDENT issuer (five concurrent streaming
    // queries in production), so each writes on its own idempotence
    // channel — on a shared channel a peer's higher id committing first
    // would skip a slower writer's never-committed batch
    val (tWall, _) = time {
      val ts = batches.map { case (id, b) =>
        new Thread(() =>
          try graft.ext.Ivf.addToSavedIndex(spark, idx, b,
            batchId = Some(id), writer = s"w$id")
          catch { case t: Throwable => errs.add(t); () })
      } :+ new Thread(() =>
        try graft.ext.Ivf.rebalanceSavedIndex(spark, idx,
          nLists = 16, iters = 0)
        catch { case t: Throwable => errs.add(t); () })
      ts.foreach(_.start()); ts.foreach(_.join(600000))
    }
    require(errs.isEmpty, s"no writer may fail: ${errs.peek()}")
    val lists = AtomicLanding.read(spark, s"$idx/lists")
    val nRows = lists.count()
    val nIds = lists.select("neighbor_id").distinct().count()
    val expect = e.count() + 5 * 200
    require(nRows == expect && nIds == expect,
      s"zero lost batches, zero duplicates: rows=$nRows ids=$nIds expect=$expect")
    // the FALSIFIABLE watermark check: every identified batch must
    // REPLAY AS A NO-OP on its own channel. If any channel's mark
    // escaped durability (or a racing rewrite erased a `# wmark` line),
    // the replay lands 200 duplicate rows and the count below moves.
    // (This check is what exposed the shared-channel protocol's
    // watermark regression under out-of-id-order commits — the bug the
    // monotone marks + writer channels now close.)
    batches.foreach { case (id, b) =>
      graft.ext.Ivf.addToSavedIndex(spark, idx, b, batchId = Some(id),
        writer = s"w$id")
    }
    require(AtomicLanding.read(spark, s"$idx/lists").count() == nRows,
      "every raced batch id must replay as a no-op (durable watermark)")
    val snap = AtomicLanding.linkedSnapshot(idx).get
    require(AtomicLanding.currentVersion(s"$idx/lists")
      .contains(snap.members("lists")) ||
      AtomicLanding.currentVersion(s"$idx/lists").get >= snap.members("lists"),
      "the live lists may never regress behind the root pin")
    // a post-race drifted rebalance converges the index to the
    // canonical one-shot bits over the union corpus
    graft.ext.Ivf.rebalanceSavedIndex(spark, idx, nLists = 16, iters = 0)
    val _ = retries0
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    f"""{"wall_sec":$tWall%.3f,"rows":$nRows,""" +
      f""""writers":6,"lost_batches":0}"""
  }

  private def deleteSection(spark: SparkSession, dir: String,
      scratch: String): String = {
    import graft.land.AtomicLanding
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      (((System.nanoTime() - t0) / 1e9), r)
    }
    val tbl = s"$scratch/orders_del"
    val o = Tables.t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val kSpan = span(o, "o_orderkey")
    val q = kSpan / 4
    // segments are committed ROUND-ROBIN-shuffled: within a dir every
    // row group spans the dir's whole key range, so parquet row-group
    // stats cannot skip inside it — dir-level manifest ranges are the
    // only pruning surface, which is exactly what this leg prices
    // (the source fixture is key-ordered, and committing it as-is
    // would let footer skipping serve the unpruned read for free)
    AtomicLanding.commit(o.filter(col("o_orderkey") < q).repartition(32), tbl,
      statsKeys = Seq("o_orderkey"))
    Seq((q, 2 * q), (2 * q, 3 * q), (3 * q, kSpan)).foreach { case (lo, hi) =>
      AtomicLanding.commit(
        o.filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
          .repartition(32),
        tbl, append = true)
    }
    // shallow clone of the 4-segment body: O(metadata) — the timed row
    // must stay FLAT while the referenced corpus grows 100×
    val (tClone, _) = time(
      AtomicLanding.cloneShallow(tbl, s"$scratch/orders_clone"))
    require(AtomicLanding.read(spark, s"$scratch/orders_clone").count() ==
      AtomicLanding.read(spark, tbl).count(),
      "the clone must serve the source snapshot bit-for-bit")
    // the fixed tail: the base-scale head re-keyed beyond every segment
    val tail = o.orderBy(col("o_orderkey")).limit(2000)
      .withColumn("o_orderkey", col("o_orderkey") + lit(2L * kSpan))
      .localCheckpoint()
    AtomicLanding.commit(tail, tbl, append = true)
    val total = AtomicLanding.read(spark, tbl).count()
    require(AtomicLanding.liveDirCount(tbl) == 5)
    // manifest-pruned read of the tail interval: plans ONE dir of five
    // from a single manifest read and must stay FLAT. The unpruned
    // filtered read measures flat here TOO — each segment FILE's
    // min/max is tight, so parquet file-level stats skip the body just
    // as selectively at this dir count; the manifest path's advantage
    // is the METADATA shape (one small manifest vs listing + footer
    // probes across every file of every dir), which is the term that
    // grows with file count on a 100 TB table and with object-store
    // round-trip latency — both rows are reported so the curve records
    // that honestly rather than manufacturing a decode gap
    require(AtomicLanding
      .planPrunedDirs(tbl, "o_orderkey", 2L * kSpan, 3L * kSpan).size == 1,
      "the tail probe interval must plan exactly the tail dir")
    val (tPruned, sPruned) = time(
      AtomicLanding.readPruned(spark, tbl, "o_orderkey", 2L * kSpan, 3L * kSpan)
        .agg(sum(col("o_custkey"))).head().getLong(0))
    val (tFull, sFull) = time(
      AtomicLanding.read(spark, tbl)
        .filter(col("o_orderkey").between(2L * kSpan, 3L * kSpan))
        .agg(sum(col("o_custkey"))).head().getLong(0))
    require(sPruned == sFull,
      "the pruned read must equal the filtered full read")
    val spark2 = spark; import spark2.implicits._
    val v0 = AtomicLanding.currentVersion(tbl).get
    val ghost = (0 until 500).map(i => 10L * kSpan + i)
      .toDF("o_orderkey").localCheckpoint()
    val (tNoop, vNoop) = time(
      AtomicLanding.deletePruned(ghost, tbl, "o_orderkey"))
    require(vNoop == v0, "ghost keys must be a provable no-op")
    val victims = tail.select(col("o_orderkey"))
      .orderBy(col("o_orderkey")).limit(500).localCheckpoint()
    val (tTail, _) = time(
      AtomicLanding.deletePruned(victims, tbl, "o_orderkey"))
    require(AtomicLanding.read(spark, tbl).count() == total - 500,
      "the tail delete must remove exactly its victims")
    require(AtomicLanding.liveDirCount(tbl) == 5,
      "the tail delete must carry all four body segments")
    val bodyVictims = o.orderBy(col("o_orderkey")).limit(500)
      .select(col("o_orderkey")).localCheckpoint()
    val (tBody, _) = time(
      AtomicLanding.deletePruned(bodyVictims, tbl, "o_orderkey"))
    require(AtomicLanding.read(spark, tbl).count() == total - 1000,
      "the body delete must remove exactly its victims")
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    f"""{"rows":$total,"clone_sec":$tClone%.3f,""" +
      f""""read_pruned_sec":$tPruned%.3f,"read_full_sec":$tFull%.3f,""" +
      f""""noop_sec":$tNoop%.3f,""" +
      f""""tail_delete_sec":$tTail%.3f,"body_delete_sec":$tBody%.3f}"""
  }

  /** IVF-PQ major maintenance at scale — the
    * [[graft.ext.IvfPq.rebalanceSavedIndex]] leg: the compressed index
    * over the full embeddings corpus takes three FIXED identified
    * appends, then a full retrain-recode rebalance from the
    * caller-supplied corpus. Claims under the clock: appends track the
    * batch (flat across scales); the census fence costs one id-only
    * anti-join (O(index) ids, two pruned columns — it rides inside
    * `rebalance_sec`); the rebalance itself is corpus-shaped like the
    * build, never super-linear past it. Row conservation and a fresh
    * root pin are require()d at both scales. */
  private def pqRebalSection(spark: SparkSession, dir: String,
      scratch: String): String = {
    import graft.land.AtomicLanding
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      (((System.nanoTime() - t0) / 1e9), r)
    }
    val idx = s"$scratch/pqidx"
    val e = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val vSpan = span(e, "vec_id")
    val (tBuild, _) = time(
      graft.ext.IvfPq.save(graft.ext.IvfPq.buildIndex(e), idx,
        batchId = Some(0L)))
    val rows0 = AtomicLanding.read(spark, s"$idx/n2").count()
    val batchSrc = e.orderBy(col("vec_id")).limit(200).localCheckpoint()
    val shifted = (1 to 3).map(i =>
      batchSrc.select((col("vec_id") + lit(i * vSpan)).as("vec_id"),
        col("embedding")))
    val (tAppend, _) = time {
      shifted.zipWithIndex.foreach { case (b, i) =>
        graft.ext.IvfPq.addToSavedIndex(spark, idx, b,
          batchId = Some(i + 1L)); ()
      }
    }
    require(AtomicLanding.read(spark, s"$idx/n2").count() == rows0 + 600,
      "appends must add exactly the batch rows")
    val root0 = AtomicLanding.currentRootVersion(idx).get
    // the rebalance corpus = live ids (corpus + the shifted appends),
    // exactly what a production retrain-on-drift would supply
    val corpus = shifted.foldLeft(e)(_ unionByName _)
    // NO-DRIFT leg: higher-id appends leave the canonical seeds
    // unchanged — the drift probe skips the recode; this prices the
    // probe itself (two id-only anti-joins + the seed comparison),
    // the r16 answer to "rebalance >= fresh build at 100x"
    val skips0 = graft.ext.IvfPq.rebalanceSkips.get()
    val (tNoDrift, _) = time(
      graft.ext.IvfPq.rebalanceSavedIndex(spark, idx, corpus))
    require(graft.ext.IvfPq.rebalanceSkips.get() == skips0 + 1 &&
      AtomicLanding.currentRootVersion(idx).contains(root0),
      "a no-drift rebalance must skip and publish nothing")
    // DRIFTED leg: a batch below the id floor moves the seed prefix
    val low = batchSrc.select((col("vec_id") - lit(vSpan)).as("vec_id"),
      col("embedding")).localCheckpoint()
    graft.ext.IvfPq.addToSavedIndex(spark, idx, low, batchId = Some(4L))
    val (tRebal, _) = time(
      graft.ext.IvfPq.rebalanceSavedIndex(spark, idx,
        corpus.unionByName(low)))
    require(AtomicLanding.currentRootVersion(idx).exists(_ > root0),
      "a drifted rebalance must publish a fresh root generation")
    require(AtomicLanding.read(spark, s"$idx/n2").count() == rows0 + 800,
      "the rewrite must conserve rows")
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    f"""{"build_sec":$tBuild%.3f,"n2_rows":$rows0,""" +
      f""""append3_sec":$tAppend%.3f,"rebalance_nodrift_sec":$tNoDrift%.3f,""" +
      f""""rebalance_sec":$tRebal%.3f}"""
  }

  /** Z-order layout maintenance at scale — the
    * [[graft.ext.Zorder.maintainZordered]] leg: the orders corpus is
    * z-committed once (the corpus-sized contrast row), takes three
    * FIXED 2000-row unordered tail appends (the decay path — ingest
    * never pays the body's range shuffle), then one fold. The claim
    * under the clock: the fold rewrites ONLY the tail, so `fold_sec`
    * must stay FLAT at 100× while the body it leaves untouched grows
    * 100×. Decay before (tail footer spans ~the domain) and restored
    * locality after (fold-dir spans bounded) are require()d via
    * parquet footer stats at both scales, as is row conservation and
    * the body+folded-tail dir layout. */
  private def zmaintSection(spark: SparkSession, dir: String,
      scratch: String): String = {
    import graft.land.AtomicLanding
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      (((System.nanoTime() - t0) / 1e9), r)
    }
    val tbl = s"$scratch/orders_z"
    val cols = Seq("o_custkey", "o_orderkey")
    val o = Tables.t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val (tBody, _) = time(graft.ext.Zorder.zorderedCommit(
      o, tbl, cols, bits = 16, nFiles = 8))
    val rows0 = AtomicLanding.read(spark, tbl).count()
    // fixed batches: the base-scale head re-appended (key dupes are
    // fine — the table has no uniqueness contract), so batch content,
    // size, and key-domain shape are identical at every scale
    val batchSrc = o.orderBy(col("o_orderkey")).limit(2000).localCheckpoint()
    val (tAppend, _) = time {
      (1 to 3).foreach { i =>
        graft.ext.Zorder.appendUnordered(batchSrc, tbl, cols,
          bits = 16, batchId = Some(i.toLong)); ()
      }
    }
    def dirBytes(d: String): Long = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$tbl/$d")).getLength
    val dirs0 = AtomicLanding.dirsOfVersion(tbl,
      AtomicLanding.currentVersion(tbl).get)
    val bodyDir = dirs0.maxBy(dirBytes)
    val tailDirs = dirs0.filterNot(_ == bodyDir)
    require(tailDirs.size == 3, s"expected 3 tail dirs, got ${tailDirs.size}")
    // decay evidence, measured BEFORE the fold: unordered tail files
    // each span ~the whole (tail-local) domain on both dimensions
    val decayed = cols.forall(c => graft.ext.Zorder.meanSpanFraction(
      spark, tailDirs.map(d => s"$tbl/$d"), c) > 0.5)
    require(decayed, "the unshuffled tail must measure as decayed pre-fold")
    val (tFold, comp) = time(graft.ext.Zorder.maintainZordered(
      spark, tbl, cols, bits = 16,
      smallBytes = dirBytes(bodyDir) - 1, nFiles = 8))
    require(comp.foldDir.nonEmpty, "the tail must have folded")
    val rowsAfter = AtomicLanding.read(spark, tbl).count()
    require(rowsAfter == rows0 + 6000,
      s"the fold must conserve rows: $rows0 + 6000 != $rowsAfter")
    val dirsAfter = AtomicLanding.liveDirCount(tbl)
    require(dirsAfter == 2,
      s"the fold must leave body + folded tail, got $dirsAfter dirs")
    val local = cols.forall(c => graft.ext.Zorder.meanSpanFraction(
      spark, Seq(s"$tbl/${comp.foldDir.get}"), c) <= 0.7)
    require(local, "the folded tail must measure z-local post-fold")
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    f"""{"body_sec":$tBody%.3f,"body_rows":$rows0,""" +
      f""""append3_sec":$tAppend%.3f,"fold_sec":$tFold%.3f,""" +
      f""""fold_rows":6000,"dirs_after":$dirsAfter}"""
  }

  /** Distributed CC on an ENTITY-SHAPED graph — bounded components
    * (chains of 100 keys over the scaled customer keyspace) whose COUNT
    * scales with the corpus, unlike the zero-padded-name fixture where
    * 100× manufactures one corpus-sized component. localSolveMax = 0
    * forces star contraction at both scales; the round count must stay
    * ~flat (component size is fixed) while wall grows sub-linearly. */
  private def ccSection(spark: SparkSession, dir: String): (Double, Int, Long) = {
    val edges = Tables.t(spark, dir, "customer")
      .select(col("c_custkey").as("doc_a"))
      .where(pmod(col("doc_a"), lit(100L)) =!= 0L)
      .withColumn("doc_b", col("doc_a") + 1L)
    val t0 = System.nanoTime()
    val (comp, rounds) = graft.ext.ConnectedComponents
      .componentsWithRounds(edges, localSolveMax = 0L)
    val nComp = comp.agg(countDistinct(col("component"))).head().getLong(0)
    (((System.nanoTime() - t0) / 1e9), rounds, nComp)
  }

  private def joinCensus(df: DataFrame): String = {
    val p = df.queryExecution.executedPlan.toString
    def c(s: String) = s.r.findAllIn(p).size
    s"bhj=${c("BroadcastHashJoin")},smj=${c("SortMergeJoin")},shj=${c("ShuffledHashJoin")}"
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val n = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.build(Sessions.cpusFromEnv, "graft-scalebench")
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, base, out, n)

    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    val qs = (Headline.map(name => name -> SparkEntry.queries(name)) ++ Extra)
      .filter { case (name, _) =>
        // two rows run ONLY when explicitly named: q_entity_names
        // forces the distributed star-contraction CC path
        // (localSolveMax = 0) and the dense zero-padded name corpus
        // makes the 100× giant component an hours-long worst case by
        // construction (the cc section covers distributed CC at 100×
        // on the bounded-component graph instead); q_fuzzy_names_ed2's
        // hot-bucket candidate volume on the same corpus grows into
        // the billions at 100× — probe both at moderate replica counts
        // with the `only` filter, not in the full curve
        only.map(_.contains(name))
          .getOrElse(name != "q_entity_names" && name != "q_fuzzy_names_ed2" &&
            name != "q_fuzzy_names_ed2_auto")
      }
    def time(dir: String): Map[String, (Double, String)] = {
      qs.foreach { case (_, fn) => Bench.materialize(fn(spark, dir)) } // warm-up
      def pass(): Map[String, (Double, String)] = qs.map { case (name, fn) =>
        // construction INSIDE the timer, like graft.Bench: queries that
        // do eager work while building (iterative checkpoint loops —
        // q_pagerank) would otherwise run their whole computation
        // outside the clock and report only the final-table read
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        Bench.materialize(df)
        name -> (((System.nanoTime() - t0) / 1e9, joinCensus(df)))
      }.toMap
      val p1 = pass(); val p2 = pass()
      qs.map { case (name, _) =>
        val (a, ja) = p1(name); val (b, _) = p2(name)
        name -> ((math.min(a, b), ja))
      }.toMap
    }
    // host-load sentinels bracketing the whole measured window (the
    // §24.5 dual-metric discipline applied to probes, not just boards):
    // a fixed trivial job timed before the base pass and after the
    // scaled pass — far-apart or far-above-historic sentinels mean the
    // window was contaminated and the curve should be re-run, not
    // narrated around
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 20000000L, 1, 32)
        .selectExpr("sum(id * 3 % 7) s").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val sentFirst = { sentinel(); sentinel() }
    val baseT = time(base)
    val sentMid = sentinel()
    val scaledT = time(out)
    val sentLast = sentinel()
    val rows = qs.map(_._1).map { q =>
      val (b, jb) = baseT(q); val (s, js) = scaledT(q)
      f""""$q":{"base_sec":$b%.3f,"scaled_sec":$s%.3f,"ratio":${s / b}%.2f,"joins_base":"$jb","joins_scaled":"$js"}"""
    }.mkString(",")
    val rb = baseT.values.map(_._1).sum
    val rs = scaledT.values.map(_._1).sum
    // ACID + CC sections run on the full curve (or when named via
    // `only` as "acid" / "cc"); a filtered query probe skips them
    val runAcid = only.forall(_.contains("acid"))
    val runCc = only.forall(_.contains("cc"))
    val acidJson =
      if (!runAcid) ""
      else {
        // per-run scratch: two bench runs on one host must not clobber
        // each other's live ACID tables mid-measurement
        val runTag = java.util.UUID.randomUUID().toString.take(8)
        val ab = acidSection(spark, base, s"/tmp/graft_acid_base_$runTag")
        val as = acidSection(spark, out, s"/tmp/graft_acid_scaled_$runTag")
        s""","acid":{"base":$ab,"scaled":$as}"""
      }
    val ccJson =
      if (!runCc) ""
      else {
        val (cb, roundsB, compB) = ccSection(spark, base)
        val (cs, roundsS, compS) = ccSection(spark, out)
        f""","cc":{"base_sec":$cb%.3f,"scaled_sec":$cs%.3f,""" +
          f""""ratio":${cs / cb}%.2f,"rounds_base":$roundsB,""" +
          f""""rounds_scaled":$roundsS,"components_base":$compB,""" +
          f""""components_scaled":$compS}"""
      }
    val runMaint = only.forall(_.contains("maint"))
    val maintJson =
      if (!runMaint) ""
      else {
        val runTag = java.util.UUID.randomUUID().toString.take(8)
        val mb = maintSection(spark, base, s"/tmp/graft_maint_base_$runTag")
        val ms = maintSection(spark, out, s"/tmp/graft_maint_scaled_$runTag")
        s""","maint":{"base":$mb,"scaled":$ms}"""
      }
    val runClusters = only.forall(_.contains("clusters"))
    val clustersJson =
      if (!runClusters) ""
      else {
        val runTag = java.util.UUID.randomUUID().toString.take(8)
        val cb = clustersSection(spark, base, s"/tmp/graft_clusters_base_$runTag")
        val cs = clustersSection(spark, out, s"/tmp/graft_clusters_scaled_$runTag")
        s""","clusters":{"base":$cb,"scaled":$cs}"""
      }
    val runIvfRebal = only.forall(_.contains("ivfrebal"))
    val ivfRebalJson =
      if (!runIvfRebal) ""
      else {
        val runTag = java.util.UUID.randomUUID().toString.take(8)
        val ib = ivfRebalSection(spark, base, s"/tmp/graft_ivfrebal_base_$runTag")
        val is = ivfRebalSection(spark, out, s"/tmp/graft_ivfrebal_scaled_$runTag")
        s""","ivf_rebalance":{"base":$ib,"scaled":$is}"""
      }
    val runDelete = only.forall(_.contains("delete"))
    val deleteJson =
      if (!runDelete) ""
      else {
        val runTag = java.util.UUID.randomUUID().toString.take(8)
        val db = deleteSection(spark, base, s"/tmp/graft_delete_base_$runTag")
        val ds = deleteSection(spark, out, s"/tmp/graft_delete_scaled_$runTag")
        s""","delete_pruned":{"base":$db,"scaled":$ds}"""
      }
    val runPqRebal = only.forall(_.contains("pqrebal"))
    val pqRebalJson =
      if (!runPqRebal) ""
      else {
        val runTag = java.util.UUID.randomUUID().toString.take(8)
        val pb = pqRebalSection(spark, base, s"/tmp/graft_pqrebal_base_$runTag")
        val ps = pqRebalSection(spark, out, s"/tmp/graft_pqrebal_scaled_$runTag")
        s""","ivfpq_rebalance":{"base":$pb,"scaled":$ps}"""
      }
    val runDeconInc = only.forall(_.contains("deconinc"))
    val deconIncJson =
      if (!runDeconInc) ""
      else {
        val runTag = java.util.UUID.randomUUID().toString.take(8)
        val db = deconIncSection(spark, base, s"/tmp/graft_deconinc_base_$runTag")
        val ds = deconIncSection(spark, out, s"/tmp/graft_deconinc_scaled_$runTag")
        s""","decon_incremental":{"base":$db,"scaled":$ds}"""
      }
    val runMulti = only.forall(_.contains("multiwriter"))
    val multiJson =
      if (!runMulti) ""
      else {
        val runTag = java.util.UUID.randomUUID().toString.take(8)
        val mb = multiWriterSection(spark, base, s"/tmp/graft_mw_base_$runTag")
        val ms = multiWriterSection(spark, out, s"/tmp/graft_mw_scaled_$runTag")
        s""","multi_writer":{"base":$mb,"scaled":$ms}"""
      }
    val runZmaint = only.forall(_.contains("zmaint"))
    val zmaintJson =
      if (!runZmaint) ""
      else {
        val runTag = java.util.UUID.randomUUID().toString.take(8)
        val zb = zmaintSection(spark, base, s"/tmp/graft_zmaint_base_$runTag")
        val zs = zmaintSection(spark, out, s"/tmp/graft_zmaint_scaled_$runTag")
        s""","zorder_maint":{"base":$zb,"scaled":$zs}"""
      }
    println(s"""{"metric":"scale_curve","replicas":$n,"base":"$base","scaled":"$out","base_total_sec":$rb,"scaled_total_sec":$rs,"total_ratio":${rs / rb},"sentinel_first_sec":$sentFirst,"sentinel_mid_sec":$sentMid,"sentinel_last_sec":$sentLast,"queries":{$rows}$acidJson$ccJson$maintJson$clustersJson$ivfRebalJson$pqRebalJson$zmaintJson$deleteJson$deconIncJson$multiJson}""")
    spark.stop()
  }
}
