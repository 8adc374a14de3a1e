package graft

import org.apache.spark.sql.functions._

/** Measure recall@k of the TRAINED approximate indexes against exact
  * brute force — the tool that sizes the recall envelopes pinned by
  * `q_cosine_ivf_trained` / `q_cosine_pq_trained` (the hash gate can
  * only replay DETERMINISTIC integer math; Lloyd-trained float
  * centroids/codebooks don't replay cross-engine, so their rows gate a
  * measured recall flag instead — the q_hll_merge pattern).
  *
  * Usage: runMain graft.RecallProbe [sfDir] [reps]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.build(Sessions.cpusFromEnv, "graft-recallprobe")
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val k = 10
    val exact = graft.ext.Similarity.topKBrute(e, q, k)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    val nq = q.count()

    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val hits = approx.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      hits.toDouble / (nq * k)
    }

    (1 to reps).foreach { r =>
      val ivf = recall(graft.ext.Ivf.topKIvf(e, q, k,
        nLists = 16, nProbe = 4, iters = 3))
      val cb = graft.ext.Pq.train(e, m = 8, k = 16, iters = 2)
      val pq = recall(graft.ext.Pq.topKRerank(e, q, k, cb, shortlist = 50))
      // the COMPOSED trained index: Lloyd coarse + Lloyd residual
      // codebooks (sizes q_cosine_ivfpq_trained's envelope floor)
      val idx = graft.ext.IvfPq.buildIndex(e, nLists = 16, m = 8, k = 16,
        itersCoarse = 3, itersPq = 2)
      val ivfpq = recall(graft.ext.IvfPq.probe(e, idx, q, k,
        nProbe = 4, shortlist = 50))
      println(f"RECALL rep=$r dir=$dir ivf_trained=$ivf%.4f " +
        f"pq_trained=$pq%.4f ivfpq_trained=$ivfpq%.4f")
    }
    spark.stop()
  }
}
