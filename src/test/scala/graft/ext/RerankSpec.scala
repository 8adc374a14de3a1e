package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RerankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ordered-bigram proximity outranks scattered terms at equal coverage") {
    // both docs contain both query terms once (same matched, same
    // capped_tf, same length); only doc 2 has them ADJACENT in order
    val docs = Seq(
      (1L, "spark x y z engine pad pad pad"),
      (2L, "spark engine x y z pad pad pad")).toDF("doc_id", "text")
    val qs = Seq((0L, "spark engine")).toDF("query_id", "qtext")
    val shortlist = Seq((0L, 1L), (0L, 2L)).toDF("query_id", "doc_id")
    val got = Rerank.rerank(shortlist, docs, qs, k = 2)
      .orderBy("rnk").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 1L))
    // exactly one bigram hit's worth of score separates them:
    // 1000*(4*2 + 2*2 + 8*1) div 28  vs  1000*(4*2 + 2*2) div 28
    assert(got(0).getAs[Long]("rr_score") == 20000L / 28)
    assert(got(1).getAs[Long]("rr_score") == 12000L / 28)
  }

  test("zero-hit shortlist pairs are scored 0 and kept, never dropped") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val qs = Seq((0L, "omega psi")).toDF("query_id", "qtext")
    val shortlist = Seq((0L, 1L), (0L, 2L)).toDF("query_id", "doc_id")
    val got = Rerank.rerank(shortlist, docs, qs, k = 5).collect()
    assert(got.length == 2, "an ANN-style no-term-overlap shortlist must survive")
    assert(got.forall(_.getAs[Long]("rr_score") == 0L))
    // deterministic tie: doc_id ascending
    assert(got.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("doc_id")).toSeq
      == Seq(1L, 2L))
  }

  test("saturated tf: the 4th occurrence of a term adds nothing") {
    val docs = Seq(
      (1L, "w w w pad pad pad pad pad"),
      (2L, "w w w w pad pad pad pad")).toDF("doc_id", "text")
    val qs = Seq((0L, "w")).toDF("query_id", "qtext")
    val shortlist = Seq((0L, 1L), (0L, 2L)).toDF("query_id", "doc_id")
    val scores = Rerank.rerank(shortlist, docs, qs, k = 2)
      .orderBy("doc_id").select("rr_score").as[Long].collect()
    assert(scores(0) == scores(1), "tf is capped at 3: equal scores")
  }

  test("end-to-end over the corpus: reranks the BM25 shortlist, k bound holds, feature signals live") {
    val d = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val qs = d.where(col("doc_id") < 4)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " ", -1), 1, 6)).as("qtext"))
    val short = Retrieval.bm25TopK(d, qs, k = 10)
    val got = Rerank.rerank(short, d, qs, k = 5)
    val rows = got.collect()
    assert(rows.groupBy(_.getAs[Long]("query_id")).forall(_._2.length <= 5))
    // every reranked pair came from the shortlist
    assert(got.join(short.select("query_id", "doc_id"),
      Seq("query_id", "doc_id"), "left_anti").count() == 0)
    // feature signal is live on the corpus: every query's winner has a
    // positive score (its prefix terms exist verbatim in its own doc,
    // so SOME candidate must score; the winner may legitimately be a
    // shorter doc than the source — the length saturation's intent)
    val top1 = rows.filter(_.getAs[Long]("rnk") == 1L)
    assert(top1.length == 4)
    top1.foreach(r => assert(r.getAs[Long]("rr_score") > 0L,
      s"query ${r.get(0)}: dead feature signal"))
    assert(rows.forall(_.getAs[Long]("rr_score") >= 0L))
  }

  test("duplicate shortlist pairs neither double-count features nor emit twice (ADVICE r18)") {
    val docs = Seq((1L, "spark engine pad pad")).toDF("doc_id", "text")
    val qs = Seq((0L, "spark engine")).toDF("query_id", "qtext")
    val once = Seq((0L, 1L)).toDF("query_id", "doc_id")
    val twice = Seq((0L, 1L), (0L, 1L)).toDF("query_id", "doc_id")
    val a = Rerank.rerank(once, docs, qs, k = 5).collect()
    val b = Rerank.rerank(twice, docs, qs, k = 5).collect()
    assert(b.length == 1, "a duplicated pair must emit one ranked row")
    assert(a.head.getAs[Long]("rr_score") == b.head.getAs[Long]("rr_score"),
      "a duplicated pair must not double-count matched/tf/bigram features")
  }

  test("semantic feature: a planted paraphrase (high cosine, zero term overlap) outranks a term-spam doc (VERDICT r18 item 5)") {
    // doc 1 = term spam: repeats the query's words, embedding opposite
    // the query's; doc 2 = paraphrase: shares NO term, embedding equal
    // to the query's. Quantization stats train on the doc corpus; the
    // 4-dim fixture quantizes q ≡ doc2 and q ⟂(=-1) doc1 exactly.
    val docs = Seq(
      (1L, "red fox red fox red fox"),
      (2L, "blue bird")).toDF("doc_id", "text")
    val qs = Seq((0L, "red fox")).toDF("query_id", "qtext")
    val shortlist = Seq((0L, 1L), (0L, 2L)).toDF("query_id", "doc_id")
    val dv = Seq(
      (1L, Seq(-1.0f, 0.5f, -0.5f, 1.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("doc_id", "embedding")
    val qv = Seq((0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("query_id", "embedding")
    // without the feature the spam doc wins on text features alone
    val textOnly = Rerank.rerank(shortlist, docs, qs, k = 2)
      .orderBy("rnk").collect()
    assert(textOnly.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    // with it, the paraphrase's quantized cosine (= 1 → 1000 pts × 2)
    // clears the spam doc's text score; the spam doc's cosine (= -1)
    // floors at 0 — no penalty below zero, just no lift
    val got = Rerank.rerank(shortlist, docs, qs, k = 2,
      docVecs = Some(dv), queryVecs = Some(qv)).orderBy("rnk").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 1L),
      "the paraphrase must outrank the term-spam doc")
    // exact scores: spam = 1000*(4*2+2*6+8*1) div (20+6) + 0;
    // paraphrase = 0 text + 2*1000
    assert(got(0).getAs[Long]("rr_score") == 2000L)
    assert(got(1).getAs[Long]("rr_score") == 28000L / 26)
  }

  test("injectable scorer: a swapped expression reorders the same shortlist; the default path's bits are untouched (VERDICT r19 item 4)") {
    // doc 1 wins the default formula on saturated tf (no ordered
    // bigram: spark never directly precedes engine); doc 2 is shorter
    // on tf but holds the only query bigram — a proximity-first scorer
    // must flip them. Default points: doc1 = 4·2 + 2·6 + 8·0 = 20 over
    // dl 8 → 20000 div 28 = 714; doc2 = 4·2 + 2·2 + 8·1 = 20 over dl 9
    // → 20000 div 29 = 689.
    val docs = Seq(
      (1L, "engine engine engine spark spark spark pad pad"),
      (2L, "spark engine z z z z z z z")).toDF("doc_id", "text")
    val qs = Seq((0L, "spark engine")).toDF("query_id", "qtext")
    val shortlist = Seq((0L, 1L), (0L, 2L)).toDF("query_id", "doc_id")
    val default = Rerank.rerank(shortlist, docs, qs, k = 2)
      .orderBy("rnk").collect()
    assert(default.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L),
      "the default formula must prefer the higher-tf doc")
    assert(default.map(_.getAs[Long]("rr_score")).toSeq
      == Seq(20000L / 28, 20000L / 29))
    // the default passed EXPLICITLY through the seam reproduces the
    // built-in bits exactly — proof the seam is the formula, not a fork
    val explicitDefault = Rerank.rerank(shortlist, docs, qs, k = 2,
      scorer = Some(expr(
        "(1000 * (4 * matched + 2 * capped_tf + 8 * bigram_hits))" +
          " div (20 + dl)") + lit(2L) * col("vec_pts")))
      .orderBy("rnk").collect()
    assert(explicitDefault.toSeq == default.toSeq,
      "an explicitly-passed default scorer must reproduce the bits")
    // a proximity-first scorer through the SAME plumbing flips the order
    val swapped = Rerank.rerank(shortlist, docs, qs, k = 2,
      scorer = Some(expr("(1000 * (16 * bigram_hits + matched)) div (20 + dl)")))
      .orderBy("rnk").collect()
    assert(swapped.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 1L),
      "the injected scorer must reorder the same shortlist")
    // swapped scores exact: doc2 = 1000*(16*1+2) div 29; doc1 = 1000*2 div 28
    assert(swapped(0).getAs[Long]("rr_score") == 18000L / 29)
    assert(swapped(1).getAs[Long]("rr_score") == 2000L / 28)
  }
}
