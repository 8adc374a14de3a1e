package graft

import org.apache.spark.sql.functions._

/** Measure the BPE trainer at production merge counts — backs the
  * "bounded driver loop" claim with numbers.
  *
  * The trainer's cost splits cleanly: ONE distributed word-count pass
  * over the corpus (scales with data volume, independent of nMerges),
  * then a driver-side merge loop over the top-`maxWords` dictionary
  * (scales with nMerges and dictionary size, independent of corpus
  * volume). The testdata corpus exercises stage 1 realistically but its
  * synthetic vocabulary (31 distinct words at sf0.1) exhausts BPE after
  * ~89 merges — useless for timing a 1k+ merge loop. So stage 2 runs on
  * a production-SHAPED dictionary derived deterministically from the
  * same testdata: ~20 pseudo-words per document (12-letter words over a
  * 16-letter alphabet via md5), giving a ~100k-word dictionary — the
  * trainer's maxWords bound — with pair structure rich enough for tens
  * of thousands of merges.
  *
  * Usage: runMain graft.BpeTrainBench [sfDir] [nMerges...]
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val merges =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(256, 1024, 2048)
    val spark = Sessions.build(Sessions.cpusFromEnv, "graft-bpetrainbench")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm the scan

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // stage 1: the distributed word-count over the REAL corpus text
    // (nMerges = 0 isolates it — the merge loop never runs)
    val (_, tWc) = time(graft.ext.Bpe.train(docs, col("text"), nMerges = 0))
    println(f"BPETRAIN dir=$dir stage=wordcount_real_corpus sec=$tWc%.2f")

    // stage 2 corpus: ~20 12-letter pseudo-words per doc, hex mapped
    // into a-p so pretokens keeps each as ONE word
    val rich = docs.select(col("doc_id"))
      .withColumn("i", explode(sequence(lit(0), lit(19))))
      .select(col("doc_id"),
        substring(translate(md5(concat(col("doc_id"), lit(":"), col("i"))),
          "0123456789", "ghijklmnop"), 1, 12).as("w"))
      .groupBy(col("doc_id")).agg(concat_ws(" ", collect_list(col("w"))).as("text"))
      .localCheckpoint(true)
    val nWords = rich.select(explode(split(col("text"), " "))).distinct().count()
    println(s"BPETRAIN dict_words=$nWords")

    var last: Option[(Int, Double)] = None
    merges.foreach { n =>
      val (table, t) = time(graft.ext.Bpe.train(rich, col("text"), nMerges = n))
      println(f"BPETRAIN dir=$dir nMerges=$n learned=${table.merges.size} " +
        f"total_sec=$t%.2f per_merge_ms=${t / n * 1000}%.2f")
      last.foreach { case (pn, pt) =>
        val slope = (t - pt) / (n - pn) // marginal sec/merge at the tail
        println(f"BPETRAIN extrapolate_32k_sec=${t + slope * (32768 - n)}%.1f " +
          f"(marginal slope ${slope * 1000}%.2f ms/merge from $pn->$n)")
      }
      last = Some((n, t))
    }
    spark.stop()
  }
}
