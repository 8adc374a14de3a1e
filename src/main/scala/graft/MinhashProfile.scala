package graft

import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the MinHash dedup stack at a scaled dir
  * (default the 100x replica dir) — the evidence behind the byte-scan
  * [[graft.functions.ShingleHash]] redesign. Run AFTER ScaleBench has
  * generated the dir. */
object MinhashProfile {
  def main(a: Array[String]): Unit = {
    val dir = a.headOption.getOrElse("/tmp/graft_sf10")
    val spark = Sessions.build(32, "minhash-profile")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"PROF $name ${(System.nanoTime - s) / 1e9}%.2f s"); r
    }
    println("PROF n_docs " + docs.count())
    val sigs = graft.ext.Dedup.minhashSignatures(docs).persist()
    t("signatures(materialize)") { sigs.count() }
    t("candidatePairs") {
      println("PROF n_cand " + graft.ext.Dedup.candidatePairs(sigs).count())
    }
    sigs.unpersist(blocking = true)
    t("end_to_end_cold") {
      println("PROF n_pairs " +
        graft.ext.Dedup.minhashNearDupPairs(docs, 0.6).count())
    }
    spark.stop(); sys.exit(0)
  }
}
