package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-stage reranking over a first-stage retrieval shortlist — the
  * retrieve→rerank pipeline every production search/RAG stack runs:
  * a cheap recall-oriented retriever ([[Retrieval.bm25TopK]], the ANN
  * tier, or their [[Retrieval.rrfFuse]] hybrid) nominates k0 candidates
  * per query, and a costlier precision-oriented scorer re-orders them.
  * The scorer here is the hand-feature LTR stage (the classic tier
  * between retrieval and a neural cross-encoder): per (query, doc) —
  *
  *  - `matched`: distinct query terms present in the doc (coverage),
  *  - `capped_tf`: sum over shared terms of min(tf, 3) (saturated
  *    term frequency — BM25's diminishing-returns shape, integerized),
  *  - `bigram_hits`: distinct query word-bigrams present verbatim in
  *    the doc (ordered proximity, the signal tf bags discard),
  *  - length saturation: `score = 1000·(4·matched + 2·capped_tf +
  *    8·bigram_hits) div (20 + dl)` — pure BIGINT, log-free, the
  *    engine's standard cross-engine-exact ranking discipline.
  *
  * The scoring expression is INJECTABLE (`scorer`): every shortlist
  * pair's features materialize as five canonical BIGINT columns —
  * `matched`, `capped_tf`, `bigram_hits`, `dl`, `vec_pts` (0 when no
  * vectors were passed) — and any Column over those names replaces the
  * default formula through UNCHANGED plumbing: bounded shortlist
  * broadcast, candidate semi-join so feature extraction touches only
  * k0·|queries| docs (never the corpus), per-pair aggregation, windowed
  * re-rank. That seam is where a neural cross-encoder plugs in (its
  * scores arriving as a column); the production shape is the same
  * either way, and is what this operator pins.
  *
  * Shuffle census at 100 TB: the shortlist is |queries|·k0 rows
  * (BOUNDED — it broadcasts twice: once as the candidate semi-join
  * filter, once expanded by query terms/bigrams as the probe side of
  * the feature joins); the corpus-sized work is one byte scan over the
  * CANDIDATE docs only. Every shortlist pair is scored — a candidate
  * with zero feature hits reranks with score 0 rather than silently
  * dropping (ANN shortlists can nominate docs sharing no term).
  */
object Rerank {

  /** @param shortlist (query_id, doc_id) candidate pairs from any
    *                  first-stage retriever
    * @param docs      (doc_id, text) corpus
    * @param queries   (query_id, qtext) query batch
    * @param k         results per query after reranking
    * @param docVecs   optional (doc_id, embedding) — with `queryVecs`,
    *                  adds a SEMANTIC feature to the scorer: the
    *                  int8-quantized cosine ([[Quantize]] codes,
    *                  [[SemDedup]]'s exact integer-dot kernel) of the
    *                  pair's embeddings, folded in as
    *                  `vecWeight * greatest(0, floor(qcos * 1000))` —
    *                  so a vector-nominated candidate sharing NO query
    *                  term (which the text features can only score 0)
    *                  orders by how much it MEANS the same thing: the
    *                  half of the hybrid story the LTR stage was
    *                  missing. Quantization stats are trained on the
    *                  doc corpus and FROZEN for the query side (clamped
    *                  out-of-envelope — the engine's standard frozen-
    *                  quantizer contract; persist them via
    *                  [[SemDedupState]] to amortize the stats pass),
    *                  and only CANDIDATE doc vectors are coded — the
    *                  feature tail stays shortlist-sized.
    * @param queryVecs optional (query_id, embedding) query embeddings
    * @param vecWeight integer weight of the semantic feature (the text
    *                  features keep their BIGINT log-free discipline)
    * @param vecStats  optional frozen (pos, mn, mx) quantization stats
    *                  — e.g. a [[SemDedupState]] `stats` member. When
    *                  absent they are trained from `docVecs` per call,
    *                  which is a corpus-linear scan a warm serving path
    *                  should amortize away by passing them in.
    * @param scorer    optional replacement scoring expression over the
    *                  five canonical feature columns (`matched`,
    *                  `capped_tf`, `bigram_hits`, `dl`, `vec_pts` — all
    *                  BIGINT, zero-coalesced). None = the default
    *                  hand-feature LTR formula, bit-for-bit. */
  def rerank(shortlist: DataFrame, docs: DataFrame, queries: DataFrame,
      k: Int, docVecs: Option[DataFrame] = None,
      queryVecs: Option[DataFrame] = None, vecWeight: Long = 2L,
      vecStats: Option[DataFrame] = None,
      scorer: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    // the shortlist is <= k0·|queries| rows and is referenced FOUR
    // times below (candidate filter, both feature probes, the final
    // pair spine) — pin it once or every reference re-runs the entire
    // first-stage retrieval plan (measured: 4x the BM25 stage without
    // the pin, the dominant cost of the unpinned operator at sf0.1).
    // distinct(): "any first-stage retriever" includes fused stages
    // that can nominate the same (query, doc) pair twice — a duplicate
    // spine row would double-count every feature (the pair-expanded
    // broadcasts join once per duplicate before the groupBys count)
    // and emit duplicate ranked rows; the dedup is free on a bounded
    // pinned frame
    val pairs = shortlist.select(col("query_id"), col("doc_id"))
      .distinct().localCheckpoint(true)
    // feature extraction touches ONLY the nominated docs — fetched
    // ONCE (the slice is bounded, and the three feature projections
    // below would otherwise each re-scan the corpus)
    val cand = docs.join(broadcast(pairs.select(col("doc_id")).distinct()),
      Seq("doc_id"), "left_semi").localCheckpoint(true)
    val dLen = cand.select(col("doc_id"),
      size(split(col("text"), " ", -1)).cast("long").as("dl"))
    val dTf = cand.select(col("doc_id"),
        explode(call_function("word_counts", col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"),
        col("tc.cnt").cast("long").as("tf"))
    val dBg = cand.select(col("doc_id"),
        explode(call_function("ngram_counts", col("text"), lit(2))).as("gc"))
      .select(col("doc_id"), col("gc.term").as("bigram"))
    val qT = queries.select(col("query_id"),
        explode(call_function("word_counts", col("qtext"))).as("tc"))
      .select(col("query_id"), col("tc.term").as("term"))
    val qB = queries.select(col("query_id"),
        explode(call_function("ngram_counts", col("qtext"), lit(2))).as("gc"))
      .select(col("query_id"), col("gc.term").as("bigram"))
    // FUSED feature extraction (guide §2.4): terms (kind 0) and bigrams
    // (kind 1) ride ONE tagged stream — one pair-expanded broadcast on
    // (doc_id, kind, term), one aggregation exchange, one spine join —
    // where the unfused shape paid two broadcasts, two groupBy
    // exchanges and two left joins for features sharing the same
    // (query_id, doc_id) key. Counts are conditional on the tag:
    // count(when(kind=...)) counts exactly the rows the split frames
    // held (sum ignores the other kind's nulls), so the five feature
    // columns are bit-identical.
    val dFeat = dTf
      .select(col("doc_id"), lit(0).as("kind"), col("term"), col("tf"))
      .unionByName(dBg.select(col("doc_id"), lit(1).as("kind"),
        col("bigram").as("term"), lit(0L).as("tf")))
    val qFeat = qT.select(col("query_id"), lit(0).as("kind"), col("term"))
      .unionByName(qB.select(col("query_id"), lit(1).as("kind"),
        col("bigram").as("term")))
    val feats = dFeat
      .join(broadcast(pairs.join(qFeat, Seq("query_id"))),
        Seq("doc_id", "kind", "term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(when(col("kind") === 0, lit(1))).as("matched"),
        sum(when(col("kind") === 0, least(col("tf"), lit(3L)))).as("capped_tf"),
        count(when(col("kind") === 1, lit(1))).as("bigram_hits"))
    // semantic feature: quantized-cosine points per shortlist pair —
    // corpus-frozen stats, CANDIDATE vectors only (one semi-join against
    // the bounded pair spine), exact integer dots, floor to BIGINT
    val vecF = (docVecs, queryVecs) match {
      case (Some(dv), Some(qv)) =>
        val stats = vecStats.getOrElse(Quantize.dimStats(
            dv.select(col("doc_id").as("vec_id"), col("embedding")))
          .localCheckpoint(true))
        def codesOf(src: DataFrame): DataFrame =
          Quantize.int8CodesWith(src, stats)
            .select(col("vec_id"), col("codes"),
              SemDedup.intDot(col("codes"), col("codes")).as("n2"))
        val dc = codesOf(dv
            .select(col("doc_id").as("vec_id"), col("embedding"))
            .join(broadcast(pairs.select(col("doc_id").as("vec_id")).distinct()),
              Seq("vec_id"), "left_semi"))
          .select(col("vec_id").as("doc_id"), col("codes").as("d_codes"),
            col("n2").as("d_n2"))
        val qc = codesOf(qv.select(col("query_id").as("vec_id"), col("embedding")))
          .select(col("vec_id").as("query_id"), col("codes").as("q_codes"),
            col("n2").as("q_n2"))
        Some(pairs.join(dc, Seq("doc_id")).join(broadcast(qc), Seq("query_id"))
          .select(col("query_id"), col("doc_id"),
            greatest(lit(0L), floor(
              SemDedup.qcos(SemDedup.intDot(col("d_codes"), col("q_codes")),
                col("d_n2"), col("q_n2")) * lit(1000.0d)).cast("long"))
              .as("vec_pts")))
      case _ => None
    }
    val byScore = Window.partitionBy(col("query_id"))
      .orderBy(col("rr_score").desc, col("doc_id").asc)
    // the SCORING SEAM: every pair's features as the five canonical
    // zero-coalesced BIGINT columns; the scorer (default or injected)
    // is one Column over them — swapping it cannot touch the plumbing
    val joined = pairs
      .join(feats, Seq("query_id", "doc_id"), "left")
      .join(dLen, Seq("doc_id"))
    val featured = vecF.fold(joined.withColumn("vec_pts", lit(0L)))(vf =>
        joined.join(vf, Seq("query_id", "doc_id"), "left"))
      .select(col("query_id"), col("doc_id"),
        coalesce(col("matched"), lit(0L)).as("matched"),
        coalesce(col("capped_tf"), lit(0L)).as("capped_tf"),
        coalesce(col("bigram_hits"), lit(0L)).as("bigram_hits"),
        col("dl"),
        coalesce(col("vec_pts"), lit(0L)).as("vec_pts"))
    featured
      .withColumn("rr_score", scorer.getOrElse(
        expr("(1000 * (4 * matched + 2 * capped_tf + 8 * bigram_hits))" +
          " div (20 + dl)") + lit(vecWeight) * col("vec_pts")))
      .withColumn("rnk", row_number().over(byScore))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("rr_score"))
  }
}
