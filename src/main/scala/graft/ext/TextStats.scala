package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps._

/** Text analysis for training-data curation: per-document statistics,
  * heuristic language ID, quality scoring, and content fingerprints.
  * Pure built-in expressions — one narrow projection over the documents
  * scan, no shuffle until the (optional) final aggregation.
  */
object TextStats {

  val Stopwords = Seq("the", "a", "of", "and", "in", "to")

  /** Per-doc stats: token counts, distinct tokens, token chars, stopword
    * ratio. */
  def stats(docs: DataFrame): DataFrame = {
    // the whole profile — token count, distinct count, stopword hits —
    // comes from ONE word_profile byte scan (staged so CollapseProject
    // keeps the single evaluation; field extracts are cheap). The split
    // + array_distinct + chained-array_remove formulation this replaces
    // allocated the token array plus one copy per removed stopword per
    // document and was the 100x curve's worst surviving row.
    val p = col("_p")
    docs.withColumn("_p",
        call_function("word_profile", col("text"),
          lit(Stopwords.mkString(",")), lit(true)))
      .select(
        col("doc_id"), col("lang"),
        p.getField("n_tok").as("n_tok"),
        p.getField("n_uniq").as("n_uniq"),
        // ≡ aggregate(w, 0, (a,t) => a + length(t)) — single-space split
        // yields exactly count(spaces)+1 tokens, so the summed token
        // lengths are the non-space chars: length - (n_tok - 1).
        (length(col("text")) - p.getField("n_tok") + lit(1)).as("tok_chars"),
        ratio(element_at(p.getField("hits"), 1), p.getField("n_tok"))
          .as("stop_ratio"))
  }

  /** Gopher-style repetition signals: the fraction of duplicate words
    * and duplicate word-3-grams per document (1 - distinct/total).
    * Template spam and boilerplate score high; columnar expressions
    * only, no shuffle. */
  def repetition(docs: DataFrame, n: Int = 3): DataFrame = {
    // stage the split ONCE: the lambda-bearing expressions below run
    // interpreted (outside codegen), where common-subexpression
    // elimination does not apply — re-deriving `words(text)` per
    // reference tripled this operator's cost
    val w = col("_w")
    val totalNgrams = greatest(size(w) - lit(n - 1), lit(1))
    val sh = array_distinct(transform(
      sequence(lit(1), totalNgrams),
      i => concat_ws(" ", slice(w, i, lit(n)))))
    docs.withColumn("_w", words(col("text")))
      .select(
        col("doc_id"),
        ratio(size(w) - size(array_distinct(w)), size(w)).as("word_rep"),
        ratio(totalNgrams - size(sh), totalNgrams).as("ngram_rep"))
  }

  /** Stopword-list hit counts per language family. Word-soup fixtures mean
    * the predictions skew English — the point is the deterministic
    * operator shape (n-gram/stopword scoring), not model accuracy. */
  private val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "los", "una", "y"),
    "fr" -> Seq("le", "les", "une", "et"))

  /** doc_id, lang (labeled), pred_lang (heuristic argmax with a fixed
    * tie-break order en > de > es > fr > und). */
  def langId(docs: DataFrame): DataFrame = {
    // all four per-family hit counts from one word_profile byte scan
    // (uniq disabled — language ID doesn't pay the distinct-token table)
    val spec = langStops.map(_._2.mkString(",")).mkString("|")
    val p = col("_p")
    val counted = docs.withColumn("_p",
        call_function("word_profile", col("text"), lit(spec), lit(false)))
      .select(
        (Seq(col("doc_id"), col("lang")) ++
          langStops.zipWithIndex.map { case ((l, _), i) =>
            element_at(p.getField("hits"), i + 1).as(s"c_$l") }): _*)
    counted.withColumn("pred_lang",
      when(col("c_en") >= col("c_de") && col("c_en") >= col("c_es") &&
           col("c_en") >= col("c_fr") && col("c_en") > 0, "en")
      .when(col("c_de") >= col("c_es") && col("c_de") >= col("c_fr") &&
            col("c_de") > 0, "de")
      .when(col("c_es") >= col("c_fr") && col("c_es") > 0, "es")
      .when(col("c_fr") > 0, "fr")
      .otherwise("und"))
      .select(col("doc_id"), col("lang"), col("pred_lang"))
  }

  /** Composite quality score in [0,1]: length term + punctuation term +
    * stopword term. A fixed left-associated chain of IEEE double ops —
    * engine-identical given identical inputs. */
  def qualityScore(docs: DataFrame): DataFrame = {
    // ALL three terms from one word_profile scan (uniq disabled): the
    // regex-token and punctuation counts ride the same byte pass as the
    // stopword hits, so the document text is read exactly once
    val p = col("_p")
    val nTok = p.getField("ws_runs")
    val punctRatio = ratio(p.getField("punct"), length(col("text")))
    val stopRatio = ratio(element_at(p.getField("hits"), 1),
      p.getField("n_tok"))
    docs.withColumn("_p",
        call_function("word_profile", col("text"),
          lit(Stopwords.mkString(",")), lit(false))).select(
      col("doc_id"),
      (lit(0.4d) * least(nTok.cast("double") / lit(100.0d), lit(1.0d))
        + lit(0.3d) * (lit(1.0d) - punctRatio)
        + lit(0.3d) * least(stopRatio * lit(5.0d), lit(1.0d))).as("score"))
  }

  /** Collocation extraction: adjacent word pairs ranked by an
    * integer-scaled lift `floor(1e6 * n_ab * N / (n_a * n_b))` — the
    * PMI numerator/denominator without the log, so the score is pure
    * bigint arithmetic and bit-identical in any engine (log via libm is
    * NOT cross-engine stable; the log is monotone, so the ranking is
    * the same). `minCount` suppresses hapax pairs, the standard PMI
    * pathology. Three corpus-wide aggregations (bigrams, unigrams,
    * total) + two UNHINTED equi-joins of the count tables — the big
    * scan never self-joins, and the unigram table carries NO broadcast
    * hint: at 100 TB the distinct-term table is 10^8-10^9 rows, past any
    * driver/broadcast limit, and `term` is a high-cardinality
    * well-distributed shuffle key. Catalyst's size-based auto-broadcast
    * (or AQE's runtime re-plan) still picks a broadcast when the vocab
    * measures small, so nothing is lost at low scale. Only the one-row
    * corpus total keeps an explicit hint — that side is bounded by
    * construction. Scaled products stay under 2^63 for corpora to ~10^5
    * occurrences per bigram x 10^8 tokens; shard the counts before
    * lifting beyond that. */
  def collocations(docs: DataFrame, minCount: Long = 5L): DataFrame = {
    // derive the token total from the unigram counts instead of a second
    // corpus scan; per-doc counts come from the word_counts byte scan, so
    // the corpus aggregation starts from one row per distinct term per
    // doc instead of one row per token occurrence
    val uni = docs.select(explode(
        call_function("word_counts", col("text"))).as("tc"))
      .select(col("tc.term").as("t"), col("tc.cnt").as("c"))
      .groupBy(col("t")).agg(sum(col("c")).as("n"))
    val total = uni.agg(sum(col("n")).as("n_total"))
    // bigram occurrences come from the byte-scan word_ngrams expression
    // and aggregate on the JOINED string ("w1 w2") — equivalent grouping
    // because words cannot contain the separator — then split back into
    // columns only for the minCount survivors. The previous interpreted
    // transform built a two-string struct per window position and was
    // this query's dominant cost at the 100x scale point.
    val bigrams = docs.select(explode(
        call_function("word_ngrams", col("text"), lit(2))).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
      .select(substring_index(col("b"), " ", 1).as("w1"),
        substring_index(col("b"), " ", -1).as("w2"), col("n_ab"))
    bigrams
      .join(uni.select(col("t").as("w1"), col("n").as("n_a")), "w1")
      .join(uni.select(col("t").as("w2"), col("n").as("n_b")), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_ab"),
        expr("(n_ab * n_total * 1000000L) div (n_a * n_b)").as("lift_scaled"))
  }

  /** Per-document top-k distinctive terms by the integer rarity score
    * score = (tf · N · 10^6) div df — term frequency times the inverse
    * document-frequency RATIO. Deliberately NOT log TF-IDF: dropping
    * the log is order-preserving only between terms of equal tf
    * (tf=1,df=1 outranks tf=10,df=N/2 here, while log TF-IDF flips
    * them), so this favors rare terms more aggressively. The trade is
    * made for the same reason [[collocations]] drops the PMI log: the
    * score stays pure bigint and bit-identical in any engine, where a
    * libm log would not hash-gate. Shuffle census: the tf table is
    * computed MAP-SIDE (word_counts byte scan — no exchange), document
    * frequency is one corpus aggregation on `term`, the join back is one
    * UNHINTED equi-join on `term`, and the per-doc top-k is a bounded
    * heap that partially aggregates before its exchange; the corpus
    * never self-joins.
    * The df table carries NO broadcast hint — it is vocabulary-sized
    * (10^8-10^9 distinct terms at 100 TB), so the scale-safe plan is a
    * shuffle join on the well-distributed `term` key; Catalyst's
    * size-based auto-broadcast still upgrades it when df measures small.
    * Only the one-row doc count keeps an explicit hint. */
  def topTermsByRarity(docs: DataFrame, k: Int): DataFrame = {
    // tf materializes SHUFFLE-FREE: per-doc term counts are a per-row
    // computation (one word_counts byte scan), where the previous
    // `explode -> groupBy(doc_id, term)` funneled every token occurrence
    // of the corpus through an exchange Spark could not elide (it cannot
    // know doc rows never span partitions)
    val tf = docs.select(col("doc_id"),
        explode(call_function("word_counts", col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"),
        col("tc.cnt").cast("long").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // per-doc ranking via the bounded heap, not a row_number window: after
    // the term-keyed join a doc's rows are spread across term partitions,
    // so the partial aggregate combines to <= k rows per (partition, doc)
    // before the exchange — a window would shuffle and sort every
    // (doc, term) row on doc_id first. Same tie-break (score desc, term
    // asc in UTF-8 byte order), and terms are unique within a doc, so the
    // heap emits exactly the window's rows.
    val tk = udaf(new TopKTermAgg(k),
      org.apache.spark.sql.Encoders.product[TermScore])
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_scaled", expr("(tf * n_docs * 1000000L) div df"))
      .groupBy(col("doc_id"))
      .agg(tk(col("term"), col("score_scaled")).as("top"))
      .select(col("doc_id"), posexplode(col("top.items")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.term").as("term"), col("col.s").as("score_scaled"))
  }

  final case class TermScore(term: String, s: Long)
  final case class TopBufT(items: Seq[TermScore])

  /** Bounded top-k aggregator keyed by (score desc, term asc) — the
    * string-termed sibling of [[Similarity.TopKAgg]]. Term order is
    * UTF-8 BYTE order, matching Spark's and DuckDB's binary string
    * comparison (Java String.compareTo orders by UTF-16 code unit,
    * which diverges for supplementary-plane code points). */
  final class TopKTermAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[TermScore, TopBufT, TopBufT] {
    private def utf8Lt(x: String, y: String): Boolean = {
      val a = x.getBytes("UTF-8")
      val b = y.getBytes("UTF-8")
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      a.length < b.length
    }
    private def trim(x: Seq[TermScore]): Seq[TermScore] =
      x.sortWith((a, b) => a.s > b.s || (a.s == b.s && utf8Lt(a.term, b.term)))
        .take(k)
    def zero: TopBufT = TopBufT(Nil)
    def reduce(b: TopBufT, a: TermScore): TopBufT = {
      // full-buffer fast path — see [[Similarity.TopKAgg]]: strictly
      // worse than the k-th under (s desc, term utf8 asc) cannot enter
      if (b.items.size >= k) {
        val w = b.items.last
        if (a.s < w.s || (a.s == w.s && utf8Lt(w.term, a.term))) return b
      }
      TopBufT(trim(b.items :+ a))
    }
    def merge(x: TopBufT, y: TopBufT): TopBufT = TopBufT(trim(x.items ++ y.items))
    def finish(r: TopBufT): TopBufT = r
    def bufferEncoder: org.apache.spark.sql.Encoder[TopBufT] =
      org.apache.spark.sql.Encoders.product[TopBufT]
    def outputEncoder: org.apache.spark.sql.Encoder[TopBufT] =
      org.apache.spark.sql.Encoders.product[TopBufT]
  }

  /** Content fingerprints: md5 of the lowercased text plus a polynomial
    * rolling hash over the token sequence (order-sensitive, unlike the
    * shingle-set hashes — two docs with the same words in different order
    * fingerprint differently). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(lower(col("text"))).as("fp_md5"),
      aggregate(
        transform(words(col("text")), t => pmod(hash60(t), lit(1000003L))),
        lit(0L),
        (acc, x) => pmod(acc * lit(1000003L) + x, lit(P))).as("fp_roll"))
}
