package graft

import org.apache.spark.sql.functions._

/** Stage-by-stage cold timing of the n-gram LM quality score at a
  * scaled dir (the [[MinhashProfile]] discipline, VERDICT r15 item 6):
  * attributes `q_lm_score`'s 100× wall to its stages — the per-doc
  * `ngram_counts` byte scan, model training, and the two model joins —
  * and times the broadcast-model variant side by side, so the 29.6×
  * leg is either cut or adjudicated scan-bound with numbers. Run AFTER
  * ScaleBench has generated the dir.
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

    // stage 1: the per-doc ngram_counts byte scan alone (no joins)
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
    // stage 3: the full default pipeline, cold (train + score joins)
    t("score_default_cold") {
      println("PROF scored " + graft.ext.LmScore
        .score(docs, graft.ext.LmScore.train(docs)).count())
    }
    // stage 4: the broadcast-model variant — model tables pinned and
    // hinted, so the corpus-sized per-doc side never shuffles
    t("score_broadcast_cold") {
      val m = graft.ext.LmScore.train(docs)
      val pinned = graft.ext.LmModel(m.n,
        m.ngrams.localCheckpoint(true), m.contexts.localCheckpoint(true),
        m.vocab)
      println("PROF scored_bcast " + graft.ext.LmScore
        .score(docs, pinned, broadcastModel = true).count())
    }
    spark.stop(); sys.exit(0)
  }
}
