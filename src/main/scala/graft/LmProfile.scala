package graft

import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the n-gram LM quality score at a scaled dir
  * (the [[MinhashProfile]] discipline, VERDICT r15 item 6 / r16 carried):
  * attributes `q_lm_score`'s 100× wall to its stages and adjudicates the
  * broadcast-model variant with numbers. Run AFTER ScaleBench has
  * generated the dir.
  *
  * Two shapes are measured because they answer different questions:
  *  - GATE shape (train + score on the same corpus, full rows
  *    materialized like the bench row): what the curve's `q_lm_score`
  *    ratio prices. Training re-aggregates the corpus, so this is
  *    scan+train-bound by construction.
  *  - PRODUCTION shape (score under a FROZEN pre-trained model — the
  *    CCNet contract: the model is reference-corpus-bounded while the
  *    scored corpus is 100 TB): score-only, default shuffled lookups
  *    vs `broadcastModel = true` map-side lookups. This is where the
  *    broadcast claim must win or die.
  *
  * Usage: runMain graft.LmProfile [dir]  (default /tmp/graft_sf100)
  */
object LmProfile {
  def main(a: Array[String]): Unit = {
    val dir = a.headOption.getOrElse("/tmp/graft_sf100")
    val spark = Sessions.build(Sessions.cpusFromEnv, "lm-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"PROF $name ${(System.nanoTime - s) / 1e9}%.2f s"); r
    }
    println("PROF n_docs " + docs.count())

    // stage 1: the per-doc ngram_counts byte scan alone (no joins) —
    // the floor no join strategy can beat
    t("perdoc_scan") {
      println("PROF perdoc_rows " + docs.select(col("doc_id"),
          explode(call_function("ngram_counts", col("text"), lit(2))).as("gc"))
        .count())
    }
    // stage 2: training (model aggregations) alone
    val model = graft.ext.LmScore.train(docs)
    t("train(materialize)") {
      println("PROF model_ngrams " + model.ngrams.count() +
        " contexts " + model.contexts.count())
    }
    // stage 3: the GATE shape, full rows materialized (count() would
    // let Catalyst prune the model joins away) — train + score + sort
    t("gate_default_cold") {
      println("PROF gate_rows_hash " + Bench.materialize(
        graft.ext.LmScore.score(docs, graft.ext.LmScore.train(docs))
          .orderBy(col("doc_id"))))
    }
    // the PRODUCTION shape: freeze the model once (one corpus-sized
    // ngram aggregate + model-sized re-derives), then score-only —
    // shuffled lookups vs map-side broadcast lookups
    val pinned = t("freeze") { graft.ext.LmScore.freeze(model) }
    t("score_frozen_default") {
      println("PROF frozen_rows_hash " + Bench.materialize(
        graft.ext.LmScore.score(docs, pinned)
          .orderBy(col("doc_id"))))
    }
    t("score_frozen_broadcast") {
      println("PROF frozen_bcast_rows_hash " + Bench.materialize(
        graft.ext.LmScore.score(docs, pinned, broadcastModel = true)
          .orderBy(col("doc_id"))))
    }
    spark.stop(); sys.exit(0)
  }
}
