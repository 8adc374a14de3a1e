package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval: score a bounded batch of queries against the
  * document corpus and return each query's top-k documents.
  *
  * The reference pipeline lands raw text into the lake
  * (`dataIngestionUtils.py:70-115` writes the landing files that a
  * downstream retrieval index consumes); the retrieval operator itself is
  * part of the training-data/RAG extension surface, not the reference's
  * own code. The scoring is the Robertson/Sparck-Jones BM25 shape
  * (Robertson et al., TREC-3) with `k1 = 6/5`, `b = 3/4`, with two
  * deliberate departures that make the score a pure BIGINT — the same
  * trade [[TextStats.topTermsByRarity]] and [[TextStats.collocations]]
  * make (a libm `log`/floating sum would not hash-gate bit-identically
  * across engines, and FLOAT SUM is order-dependent where BIGINT SUM is
  * not):
  *
  *  - idf is the RAW odds ratio `(N - df + 1/2) / (df + 1/2)`, scaled by
  *    `idfScale` and floor-divided — not its log. Order-preserving per
  *    term (the log is monotone); across terms it weights rare terms
  *    more aggressively than log-idf, exactly like the rarity score.
  *  - `avgdl` is floored to an integer once (`totalTokens div nDocs`);
  *    every downstream division is integer floor division.
  *
  * Per query term t in document d:
  * {{{
  *   idf_t   = (idfScale * (2N - 2·df_t + 1)) div (2·df_t + 1)
  *   contrib = qtf_t * (idf_t * 44 * tf * avgdl)
  *                 div (20 * tf * avgdl + 6 * avgdl + 18 * dl)
  * }}}
  * where the 44/20/6/18 constants are `k1 = 6/5`, `b = 3/4` multiplied
  * through: `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` over a common
  * denominator `20·avgdl`. `qtf` is the query-side term count (repeated
  * query terms weight linearly). All factors are exact BIGINTs, so the
  * per-document SUM is associative — any aggregation order, any engine,
  * same hash.
  *
  * Tokenization is the engine's standard single-space split
  * ([[graft.functions.WordCounts]] ≡ DuckDB `string_split(text, ' ')`);
  * `dl` counts split tokens (spaces+1), consistent with the tf table.
  *
  * Shuffle census at 100 TB (the plan-walk spec asserts the broadcast
  * side):
  *  - per-doc tf comes from the `word_counts` byte scan — NO exchange;
  *    one corpus scan, column-pruned to (doc_id, text).
  *  - the query term table is BROADCAST (a retrieval batch is bounded by
  *    contract — thousands of terms, not corpus-sized), so candidate
  *    filtering happens map-side BEFORE any shuffle: docs containing no
  *    query term never leave their partition. For a corpus-scale query
  *    set (retrieval self-join shapes) pass `broadcastQueries = false`
  *    and both sides shuffle on the well-distributed `term` key — the
  *    same dual [[IvfPq.probe]]/[[IvfPq.probeShuffle]] expose.
  *  - df is computed on the FILTERED candidates by a map-side-combined
  *    aggregate and rejoined (broadcast under the bounded-query
  *    contract, shuffle on `term` in the dual) — NOT by a
  *    term-partitioned window, which would buffer each term's entire
  *    posting list in one task (a stopword straggler the maxDf cap
  *    cannot prevent, since df is counted before the cap can drop the
  *    list). The agg's partial combine sends one row per (partition,
  *    term) to the exchange. Cost: the candidate byte scan executes
  *    twice — measured SMALL next to the per-exploded-row dl recompute
  *    this file's history fixed (SURVEY §15.3).
  *  - corpus stats (N, total tokens) are ONE one-row aggregate over
  *    another scan pruned to `text`; the stats scan carries no shuffle.
  *  - per-(query, doc) scores partially aggregate map-side (BIGINT sum),
  *    and the final per-query top-k is [[Similarity.TopKLongAgg]] — a
  *    bounded heap that combines before its exchange, ≤ k rows per
  *    (partition, query), not a `row_number` window funneling every
  *    candidate of a hot query through one partition.
  *
  * Output: (query_id, rnk, doc_id, score_scaled), rnk 1..k per query by
  * (score desc, doc_id asc); queries matching fewer than k docs emit
  * fewer rows, queries matching none emit none.
  */
object Retrieval {

  /** @param docs    (doc_id long, text string) corpus
    * @param queries (query_id long, qtext string) bounded retrieval batch
    * @param k       results per query
    * @param idfScale integer idf scale; 1000 keeps the worst-case
    *                 contribution product (idfScale·2N·2·maxDf·44·tf·avgdl)
    *                 inside Long for corpora to ~10^9 docs — raise only for
    *                 small corpora needing finer idf resolution
    * @param broadcastQueries hint the bounded query-term side (default);
    *                 false leaves both scoring joins to shuffle on `term`
    *                 for corpus-scale query sets
    * @param maxDf   drop query terms whose document frequency exceeds
    *                 this ABSOLUTE posting-list length (None = keep all).
    *                 THE quadratic-cost valve for corpus-scale query sets:
    *                 a term matched by q queries and df docs contributes
    *                 q·df scoring rows, so an absolute cap bounds every
    *                 term's join cost at qf·maxDf INDEPENDENT of corpus
    *                 size — the impact-ordered-index prune. (A fractional
    *                 cap would not survive scale-up: as N grows, a fixed
    *                 fraction admits ever-longer posting lists, and in
    *                 vocabulary-scaling corpora each shard's stopwords
    *                 slip under the global fraction while keeping their
    *                 full per-shard list length.) Cut terms are
    *                 stopword-frequency — their idf sits at the floor
    *                 already, so scores barely move. The cap filters the
    *                 df TABLE (true corpus df over the query vocabulary),
    *                 not per-candidate rows, so surviving terms score
    *                 identically to the uncapped run. */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      idfScale: Long = 1000L,
      broadcastQueries: Boolean = true,
      maxDf: Option[Long] = None): DataFrame =
    scoreTopK(tfOf(docs), dfPre = None, statsOf(docs), queries, k,
      idfScale, broadcastQueries, maxDf)

  /** Per-doc (doc_id, dl, term, tf) — map-side byte scan, no exchange.
    * dl is computed in its OWN projection BEFORE the explode: selected
    * alongside the explode it lands in the post-Generate project and
    * the full-text split re-runs once per exploded TERM row instead of
    * once per doc — measured as the dominant cost of the corpus-scale
    * self-join at 100× (~dl-terms × text-length splits, SURVEY §15). */
  private def tfOf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      size(split(col("text"), " ", -1)).cast("long").as("dl"),
      col("text"))
    .select(col("doc_id"), col("dl"),
      explode(call_function("word_counts", col("text"))).as("tc"))
    .select(col("doc_id"), col("dl"), col("tc.term").as("term"),
      col("tc.cnt").cast("long").as("tf"))

  /** One-row corpus stats; avgdl floored ONCE. */
  private def statsOf(docs: DataFrame): DataFrame = docs
    .agg(count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ", -1)).cast("long")).as("n_tok"))
    .select(col("n_docs"), expr("n_tok div n_docs").as("avgdl"))

  /** `maxDf` VALVE ADVISOR — [[FuzzyJoin.recommendMaxBucket]]'s formula
    * over POSTING-LIST lengths, so corpus-scale query sets stop
    * guessing [[bm25TopK]]'s quadratic-cost cap. One sampled census: a
    * `sampleFraction` doc sample's per-term document frequencies feed
    * one map-side-combined aggregate (approx-quantile sketch + max),
    * and the recommendation is `headroom × q_quantile(df) /
    * sampleFraction`.
    *
    * RECALL CONTRACT: the cap only cuts terms more than `headroom`×
    * more frequent than the `quantile`-typical vocabulary term — true
    * stopword outliers, whose idf sits at the floor already, so
    * surviving scores are UNCHANGED (the cap filters the df table, per
    * [[bm25TopK]]'s scaladoc). On a corpus without a stopword-shaped
    * tail the advice comes back `engages = false` and applying the cap
    * is a no-op — bit-identical scores, spec-asserted. Sampling scales
    * observed frequencies back by 1/f exactly as the bucket advisor
    * does; the advice carries the (scaled) evidence for logging. */
  def recommendMaxDf(docs: DataFrame, quantile: Double = 0.999,
      headroom: Long = 8L, sampleFraction: Double = 1.0,
      seed: Long = 42L): FuzzyJoin.ValveAdvice = {
    require(quantile > 0 && quantile < 1, s"quantile in (0,1): $quantile")
    require(headroom >= 1, s"headroom >= 1: $headroom")
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction in (0,1]: $sampleFraction")
    val sample =
      if (sampleFraction >= 1.0) docs
      else docs.sample(withReplacement = false, sampleFraction, seed)
    val r = tfOf(sample)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .agg(percentile_approx(col("df"), lit(quantile), lit(10000)).as("q"),
        max(col("df")).as("mx")).head()
    FuzzyJoin.adviseCap(r.getLong(0), r.getLong(1), headroom, sampleFraction)
  }

  /** Persisted inverted index — the multi-query-SESSION dual of the
    * inline path. The inline [[bm25TopK]] byte-scans the corpus text
    * twice PER BATCH (candidate scan under the df aggregate and again
    * as the probe side — §15.3's accepted trade for a straggler-free
    * df); right for a one-shot batch, wrong for a retrieval session
    * issuing many. The index is TWO [[graft.land.AtomicLanding]]
    * tables under `path`, so every generation publishes through an
    * atomic pointer swing and a probe racing an append always reads a
    * complete snapshot (never a torn parquet listing):
    *
    *  - `postings/` (doc_id, dl, term, tf) — append-only ACID table;
    *    one corpus byte scan at build, one BATCH scan per append.
    *  - `derived/` (term, df, n_docs, n_tok) — df rows (term, df,
    *    null, null) plus ONE stats row (null, null, n_docs, n_tok),
    *    committed with `batchId = <the postings VERSION it matches>`.
    *    One table, one pointer: df and corpus stats can never publish
    *    out of sync with each other.
    *
    * The derived/postings version handshake makes "postings appended
    * but df stale" UNOBSERVABLE: readers compare derived's recorded
    * batchId against the postings pointer and, on mismatch (the crash
    * window between the two commits), fold the missing postings dirs'
    * delta in-memory before scoring — read-only self-heal, exact by
    * the additivity of df/n_docs/n_tok over disjoint doc sets.
    *
    * Every subsequent batch scores with NO text scan and NO df
    * aggregation. df(term) over the whole corpus EQUALS df over the
    * candidate set (every doc containing the term is a candidate for
    * it), so indexed scores are bit-identical to the inline path —
    * `q_bm25_indexed` hash-gates that equality against the same oracle
    * as `q_bm25`, and RetrievalSpec pins frame-level equality incl.
    * under a maxDf cap. */
  def buildIndex(docs: DataFrame, path: String): String = {
    graft.land.AtomicLanding.commit(tfOf(docs), s"$path/postings")
    rebuildDerived(docs.sparkSession, path)
    path
  }

  /** Postings dirs read by the ADDITIVE df/stats maintenance — the
    * O(batch) proof seam: RetrievalSpec asserts each append's derived
    * refresh reads exactly the one dir that append committed, never
    * the accumulated index. */
  private[ext] val dfDeltaPostingDirs =
    new java.util.concurrent.atomic.AtomicLong
  /** Full derived rebuilds (the RECOVERY path — build time, or a
    * manifest whose dir diff is not a pure append, e.g. compaction). */
  private[ext] val derivedRebuilds =
    new java.util.concurrent.atomic.AtomicLong

  /** (term, df) rows ∪ the one stats row, from any postings slice —
    * shared by build (whole corpus), the additive delta (one batch
    * dir), and the read-side heal. Additive by construction: doc sets
    * of distinct postings dirs are disjoint (the append anti-join
    * dedupes at doc granularity and doc ids are immutable), so
    * summing two slices' rows per term — nulls grouping as the stats
    * key — IS the union slice's derivation. */
  private def derivedOf(postings: DataFrame): DataFrame =
    postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .select(col("term"), col("df"),
        lit(null).cast("long").as("n_docs"),
        lit(null).cast("long").as("n_tok"))
      .unionByName(
        postings.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
          .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_tok"))
          .select(lit(null).cast("string").as("term"),
            lit(null).cast("long").as("df"), col("n_docs"), col("n_tok")))

  /** Sum two derived slices per term (null term = the stats row). */
  private def foldDerived(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("term"))
      .agg(sum(col("df")).as("df"), sum(col("n_docs")).as("n_docs"),
        sum(col("n_tok")).as("n_tok"))
      .select(col("term"), col("df"), col("n_docs"), col("n_tok"))

  /** RECOVERY path: re-derive df/stats from the ENTIRE postings table
    * and publish, stamped with the postings version it matches. Cost
    * O(index) — only taken when the additive path cannot apply (first
    * build; derived missing after a crash mid-build; a postings dir
    * diff that is not a pure append). */
  def rebuildDerived(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit = {
    derivedRebuilds.incrementAndGet()
    val postingsT = s"$indexPath/postings"
    val pv = graft.land.AtomicLanding.currentVersion(postingsT).getOrElse(
      throw new IllegalStateException(s"no postings table at $postingsT"))
    graft.land.AtomicLanding.commit(
      derivedOf(graft.land.AtomicLanding.readVersion(spark, postingsT, pv)),
      s"$indexPath/derived", batchId = Some(pv))
  }

  /** Bring `derived/` up to postings version `toV`. The normal path is
    * ADDITIVE and O(batch): the manifest diff names exactly the dirs
    * appended since derived's recorded version, their delta is one
    * aggregation over THOSE dirs, and the fold touches the
    * vocabulary-sized derived table — the accumulated postings are
    * never re-read. Falls back to [[rebuildDerived]] when the diff
    * removed dirs (compaction/merge rewrote the postings layout) or
    * derived is missing. No-op when derived is already at (or past —
    * a concurrent maintainer won) `toV`. */
  private def advanceDerived(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, toV: Long): Unit = {
    val postingsT = s"$indexPath/postings"
    val derivedT = s"$indexPath/derived"
    val fromOpt =
      if (graft.land.AtomicLanding.currentVersion(derivedT).isEmpty) None
      else graft.land.AtomicLanding.lastBatchId(derivedT)
    fromOpt match {
      case Some(f) if f >= toV => ()
      case None => rebuildDerived(spark, indexPath)
      case Some(f) =>
        val (added, removed) = graft.land.ChangeFeed.dirDelta(postingsT, f, toV)
        if (removed.nonEmpty) rebuildDerived(spark, indexPath)
        else {
          dfDeltaPostingDirs.addAndGet(added.size)
          val old = graft.land.AtomicLanding.read(spark, derivedT)
          val next =
            if (added.isEmpty) old
            else foldDerived(old,
              derivedOf(spark.read.parquet(added.map(d => s"$postingsT/$d"): _*)))
          graft.land.AtomicLanding.commit(next, derivedT, batchId = Some(toV))
        }
    }
  }

  /** Index MAINTENANCE for a long-running retrieval session: append a
    * new batch of documents to a [[buildIndex]] index so the corpus can
    * GROW without re-scanning its text (the [[FuzzyJoin.addToSigIndex]]
    * / [[Ivf.addToIndex]] precedent). One text scan over the BATCH
    * produces its postings; the anti-join against the live snapshot
    * dedupes at (doc_id, term) granularity, so re-appending a committed
    * batch is a no-op (nothing commits at all). Doc ids are
    * immutable-by-contract: re-submitting a doc_id with DIFFERENT text
    * is undefined (the same rule every persisted index in the engine
    * carries).
    *
    * df/stats maintenance is the ADDITIVE delta, O(batch) per append:
    * the postings commit publishes first (atomic), then
    * [[advanceDerived]] folds just the committed dir into `derived/`
    * and stamps it with the new postings version. A crash between the
    * two commits cannot be observed — the version handshake makes every
    * later reader and maintainer fold or rebuild the missing delta
    * themselves (see the [[buildIndex]] scaladoc) — and
    * [[rebuildDerived]] remains the recovery path when the postings
    * layout changed by more than appends. `beforePublish` is
    * [[graft.land.AtomicLanding.commit]]'s test seam, passed through so
    * specs can probe the index mid-append.
    *
    * The grown index scores bit-identically to a fresh [[buildIndex]]
    * over the union corpus — value-gated by `q_bm25_grown` (which
    * shares `q_bm25`'s oracle) and frame-asserted in RetrievalSpec. */
  def addToIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, docs: DataFrame,
      beforePublish: () => Unit = () => ()): String = {
    val postingsT = s"$indexPath/postings"
    // heal first: a predecessor that crashed between its postings
    // commit and its derived refresh left derived behind — catch up
    // (O(missed batches)) so OUR delta folds onto current state
    advanceDerived(spark, indexPath,
      graft.land.AtomicLanding.currentVersion(postingsT).getOrElse(
        throw new IllegalStateException(s"no postings table at $postingsT")))
    val live = graft.land.AtomicLanding.read(spark, postingsT)
      .select(col("doc_id"), col("term"))
    val batch = tfOf(docs)
      .join(live, Seq("doc_id", "term"), "left_anti")
      // the anti-join hoists its keys to the front; restore tfOf's
      // column order so appended files share the index's layout
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
      .persist()
    try {
      if (!batch.isEmpty) {
        val pv = graft.land.AtomicLanding.commit(batch, postingsT,
          append = true, beforePublish = beforePublish)
        advanceDerived(spark, indexPath, pv)
      }
    } finally batch.unpersist()
    indexPath
  }

  /** Long-SESSION index maintenance — what a retrieval deployment runs
    * periodically after many [[addToIndex]] batches: every append adds
    * one postings data dir and one superseded derived generation, so an
    * unmaintained session decays into the streaming small-file problem
    * plus unbounded superseded snapshots.
    *
    *  1. catch `derived/` up (a crashed predecessor's missed delta);
    *  2. fold the small-postings-dir tail through
    *     [[graft.land.AtomicLanding.compactSmall]] — body dirs above
    *     `smallBytes` are never rewritten, and a concurrent append
    *     lands safely via the compaction rebase;
    *  3. RESTAMP `derived/` at the compacted postings version WITHOUT
    *     rebuilding: compaction preserves rows, so df/stats content is
    *     unchanged — only the version handshake moves. A concurrent
    *     append that rode the compaction's rebase is folded additively
    *     (the fold output is the manifest's LAST dir line by commit
    *     construction, so the ridden-along dirs are identifiable and
    *     their delta is O(those batches));
    *  4. vacuum both tables' superseded generations (grace-protected
    *     for live writers — but like any vacuum, a probe still holding
    *     a superseded snapshot older than this maintenance loses it:
    *     the Delta retention trade).
    *
    * Concurrent probes and appends are safe; run ONE maintainer at a
    * time (snapshot-replacing maintenance is single-writer, and a
    * concurrent rewrite skips the fold — best-effort, the next run
    * retries). Returns the vacuum-reclaimed paths. */
  def maintainIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, smallBytes: Long = 64L * 1024 * 1024,
      reservationGraceMs: Long = 600000L,
      beforeFoldCommit: () => Unit = () => ()): Seq[String] = {
    import graft.land.AtomicLanding
    val postingsT = s"$indexPath/postings"
    val derivedT = s"$indexPath/derived"
    val v0 = AtomicLanding.currentVersion(postingsT).getOrElse(
      throw new IllegalStateException(s"no postings table at $postingsT"))
    advanceDerived(spark, indexPath, v0)
    val v1 =
      try AtomicLanding.compactSmall(spark, postingsT, smallBytes,
        beforeCommit = beforeFoldCommit)
      catch { case _: java.util.ConcurrentModificationException => v0 }
    if (v1 > v0) {
      val before = AtomicLanding.dirsOfVersion(postingsT, v0).toSet
      val after = AtomicLanding.dirsOfVersion(postingsT, v1)
      val foldDir = after.last
      val extras = after.filterNot(d => before.contains(d) || d == foldDir)
      val base = AtomicLanding.read(spark, derivedT)
      dfDeltaPostingDirs.addAndGet(extras.size)
      val next =
        if (extras.isEmpty) base
        else foldDerived(base,
          derivedOf(spark.read.parquet(extras.map(d => s"$postingsT/$d"): _*)))
      AtomicLanding.commit(next, derivedT, batchId = Some(v1))
    }
    AtomicLanding.vacuum(postingsT, futureGraceMs = reservationGraceMs) ++
      AtomicLanding.vacuum(derivedT, futureGraceMs = reservationGraceMs)
  }

  /** Score a query batch from a [[buildIndex]] index. Same output
    * contract and same bits as [[bm25TopK]] on the indexed corpus.
    * Reads are snapshot-isolated (ACID pointer) and SELF-HEALING: when
    * derived's recorded version trails the postings pointer (the crash
    * window), the missing dirs' delta folds in-memory — the probe is
    * exact without writing anything. */
  def bm25TopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      queries: DataFrame,
      k: Int,
      idfScale: Long = 1000L,
      broadcastQueries: Boolean = true,
      maxDf: Option[Long] = None): DataFrame = {
    val postingsT = s"$indexPath/postings"
    val derivedT = s"$indexPath/derived"
    val pv = graft.land.AtomicLanding.currentVersion(postingsT).getOrElse(
      throw new IllegalStateException(s"no BM25 index at $indexPath"))
    val postings = graft.land.AtomicLanding.readVersion(spark, postingsT, pv)
    val derived =
      (if (graft.land.AtomicLanding.currentVersion(derivedT).isEmpty) None
       else graft.land.AtomicLanding.lastBatchId(derivedT)) match {
        case Some(dv) if dv == pv =>
          graft.land.AtomicLanding.read(spark, derivedT)
        case Some(dv) if dv < pv =>
          val (added, removed) = graft.land.ChangeFeed.dirDelta(postingsT, dv, pv)
          if (removed.nonEmpty) derivedOf(postings)
          else if (added.isEmpty) graft.land.AtomicLanding.read(spark, derivedT)
          else foldDerived(graft.land.AtomicLanding.read(spark, derivedT),
            derivedOf(spark.read.parquet(added.map(d => s"$postingsT/$d"): _*)))
        // derived missing (crash mid-build) or AHEAD of our postings
        // snapshot (an append published between our two pointer reads):
        // derive inline from the snapshot we actually read
        case _ => derivedOf(postings)
      }
    scoreTopK(postings,
      dfPre = Some(derived.where(col("term").isNotNull)
        .select(col("term"), col("df"))),
      derived.where(col("term").isNull)
        .select(col("n_docs"), expr("n_tok div n_docs").as("avgdl")),
      queries, k, idfScale, broadcastQueries, maxDf)
  }

  /** The shared scoring core. `dfPre = None` counts df over the
    * candidates per batch (inline path); `Some(table)` joins the
    * prebuilt corpus df — restricted to the query vocabulary FIRST, so
    * the broadcast hint covers a query-bounded slice, never the whole
    * vocabulary. */
  private def scoreTopK(
      tf: DataFrame,
      dfPre: Option[DataFrame],
      stats: DataFrame,
      queries: DataFrame,
      k: Int,
      idfScale: Long,
      broadcastQueries: Boolean,
      maxDf: Option[Long]): DataFrame = {
    require(k >= 1, s"bm25TopK needs k >= 1, got $k")
    require(maxDf.forall(_ > 0), s"maxDf must be positive: $maxDf")

    val hint = (d: DataFrame) => if (broadcastQueries) broadcast(d) else d

    // query-side term counts: qtf weights repeated query terms
    val qterms = queries
      .select(col("query_id"),
        explode(call_function("word_counts", col("qtext"))).as("qc"))
      .select(col("query_id"), col("qc.term").as("term"),
        col("qc.cnt").cast("long").as("qtf"))

    // candidate rows: only docs containing some query term survive the
    // map-side broadcast semi-filter (distinct terms — qtf re-attaches
    // in the scoring join, and duplicating candidate rows per repeated
    // query term before df would inflate df)
    val qvocab = qterms.select(col("term")).distinct()
    val cand = tf.join(hint(qvocab), Seq("term"))

    // df over the filtered candidates: one row per (doc, term) by
    // word_counts construction, so count(*) = document frequency.
    // A groupBy + rejoin, deliberately NOT a term-partitioned window:
    // the aggregate partially combines MAP-SIDE, so a stopword's
    // posting list contributes one row per partition to the exchange,
    // while a window would shuffle the raw candidate stream and buffer
    // each term's ENTIRE list in one task before emitting a row — at
    // real corpus scale a 10%-of-corpus stopword becomes a straggler /
    // spill hot task that the maxDf cap cannot prevent (df must be
    // counted before the filter can drop the list). The price is that
    // the candidate byte scan executes twice (once under the agg, once
    // as the probe side) — measured as the SMALL term of the
    // corpus-scale cost (54.5 → 50 s at the 100× dir; the dominant
    // term was the per-exploded-row dl recompute fixed above). The
    // indexed path pays neither scan: its df table was built once.
    // The absolute cap cuts long posting lists from the df TABLE,
    // before the scoring join multiplies them by the query side.
    val dfT0 = dfPre match {
      case Some(table) => table.join(hint(qvocab), Seq("term"))
      case None => cand.groupBy(col("term")).agg(count(lit(1)).as("df"))
    }
    val dfT = maxDf match {
      case Some(cap) => dfT0.filter(col("df") <= lit(cap))
      case None      => dfT0
    }

    val topk = udaf(new Similarity.TopKLongAgg(k),
      Encoders.product[Similarity.ScoredL])

    cand
      .join(hint(dfT), Seq("term"))
      .join(hint(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_scaled",
        expr(s"($idfScale * (2 * n_docs - 2 * df + 1)) div (2 * df + 1)"))
      .withColumn("contrib",
        expr("qtf * ((idf_scaled * 44 * tf * avgdl) div " +
          "(20 * tf * avgdl + 6 * avgdl + 18 * dl))"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score_scaled"))
      .groupBy(col("query_id"))
      .agg(topk(col("doc_id"), col("score_scaled")).as("top"))
      .select(col("query_id"), posexplode(col("top.items")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.cid").as("doc_id"), col("col.s").as("score_scaled"))
  }

  /** Reciprocal-rank fusion — the standard way to combine a lexical
    * (BM25) and a semantic (embedding-cosine) ranking into one hybrid
    * retrieval result without comparing their incommensurable scores:
    * each ranker contributes 1/(kRrf + rank) per (query, candidate) and
    * candidates re-rank by the contribution sum (Cormack, Clarke &
    * Büttcher, SIGIR'09; kRrf = 60 is the paper's constant).
    * Contributions are floor(scale / (kRrf + rank)) BIGINTs — at
    * scale = 1e12 the fusion is integer-exact and replays in any engine
    * with floor division, the same determinism recipe as the BM25
    * scoring itself.
    *
    * Inputs carry (query_id, id, rnk); rankers' extra columns are
    * ignored. Scale shape: the fused candidate set is at most
    * |queries| × Σ per-ranker k rows — bounded by construction, so the
    * union + sum + rank window all run on a table the size of the
    * RESULTS, not the corpus; the heavy lifting stays inside the
    * rankers, which keep their own 100-TB paths. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60,
      scale: Long = 1000000000000L): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    import org.apache.spark.sql.expressions.Window
    val contribs = rankings.map(_.select(col("query_id"), col("id"),
      expr(s"${scale}L div (${kRrf}L + rnk)").as("contrib")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("id").asc)
    contribs.reduce(_ unionAll _)
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("contrib")).as("rrf_score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }
}
