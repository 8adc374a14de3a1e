package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Stage-isolated cost of the rebalance DRIFT PROBE's corpus-shaped
  * pieces, before vs after the r17 probe diet (VERDICT r16 item 7: "if
  * the probe's seeding pass dominates the skip path, sample the probe
  * corpus"). The ScaleBench `ivfrebal`/`pqrebal` legs can't show the
  * diet at the fixture's 200k-vector index — both probe and rebuild sit
  * on fixed overheads there — so this main replicates the embeddings
  * table alone to a corpus where the wide column is the dominant bytes,
  * and times exactly the pieces the diet changed:
  *
  *  - SEED fetch (the `Ivf.train(corpus, n, 0)` inside the probe):
  *    OLD = `orderBy(vec_id).limit(n)` over the full frame — a
  *    TakeOrdered that scans the WIDE embedding column corpus-wide;
  *    NEW = [[graft.ext.Ivf.seedPrefix]] — a narrow id-only top-n, then
  *    a pushed-down `vec_id <=` wide read (row-group-pruned to the
  *    prefix). Same rows out, verified here.
  *  - CENSUS (missing + extras): OLD = two id anti-joins (two shuffles
  *    of the id column); NEW = one full-outer id join computing both
  *    counts in a single pass. Same counts out, verified here.
  *
  * Emits one JSON line (spool to IVF_PROBE_r{N}.json).
  *
  * Usage: runMain graft.IvfProbeProfile [baseDir] [replicas]
  *        (defaults /root/testdata/sf0.1, 1000 — a ~2M x 64-float corpus)
  */
object IvfProbeProfile {
  def main(a: Array[String]): Unit = {
    val base = a.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (a.length > 1) a(1).toInt else 1000
    val spark = Sessions.build(Sessions.cpusFromEnv, "ivf-probe-profile")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // spool keyed by BASE too: a rerun with a different baseDir but the
    // same replica count must not silently reuse the old base's spool
    val baseTag = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(base).toLong & 0xffffffffL)
    val dir = s"/tmp/graft_ivfprobe_${reps}x_$baseTag"
    val emb = s"$dir/embeddings.parquet"
    val ids = s"$dir/n2ids.parquet"
    if (!new java.io.File(emb).exists()) {
      val e0 = spark.read.parquet(s"$base/embeddings.parquet")
      val n0 = e0.count()
      spark.range(reps).toDF("rep").crossJoin(e0)
        .select((col("vec_id") + col("rep") * n0).as("vec_id"),
          col("embedding"))
        .write.mode(SaveMode.Overwrite).parquet(emb)
      // the "indexed ids" side of the census: the same id set, as the
      // n2 member would hold it (id column only)
      spark.read.parquet(emb).select(col("vec_id"))
        .write.mode(SaveMode.Overwrite).parquet(ids)
    }
    val corpus = spark.read.parquet(emb)
    val n2ids = spark.read.parquet(ids)
    val nRows = corpus.count()

    def t(f: => Unit): Double = {
      val s = System.nanoTime; f; (System.nanoTime - s) / 1e9
    }
    def warmMin(f: => Unit): Double = { t(f); math.min(t(f), t(f)) }

    // ---- seed fetch: old wide TakeOrdered vs seedPrefix ----
    val nSeeds = 16
    var oldSeeds: Seq[Long] = Nil
    var newSeeds: Seq[Long] = Nil
    val seedOld = warmMin {
      oldSeeds = corpus.orderBy(col("vec_id")).limit(nSeeds).collect()
        .map(_.getAs[Long]("vec_id")).toSeq
    }
    val seedNew = warmMin {
      newSeeds = graft.ext.Ivf.seedPrefix(corpus, nSeeds)
        .orderBy(col("vec_id")).limit(nSeeds).collect()
        .map(_.getAs[Long]("vec_id")).toSeq
    }
    require(oldSeeds == newSeeds,
      s"seed diet changed the seed rows: $oldSeeds vs $newSeeds")

    // ---- census: two anti-joins vs one full-outer pass ----
    var missOld = -1L; var extraOld = -1L
    val censusOld = warmMin {
      missOld = n2ids.join(corpus.select(col("vec_id")),
        Seq("vec_id"), "left_anti").count()
      extraOld = corpus.select(col("vec_id"))
        .join(n2ids, Seq("vec_id"), "left_anti").count()
    }
    var missNew = -1L; var extraNew = -1L
    val censusNew = warmMin {
      val r = n2ids.withColumn("_idx", lit(1))
        .join(corpus.select(col("vec_id")).withColumn("_cor", lit(1)),
          Seq("vec_id"), "full_outer")
        .agg(coalesce(sum(when(col("_cor").isNull, 1L)), lit(0L)),
          coalesce(sum(when(col("_idx").isNull, 1L)), lit(0L)))
        .head()
      missNew = r.getLong(0); extraNew = r.getLong(1)
    }
    require(missOld == missNew && extraOld == extraNew,
      s"census diet changed the counts: ($missOld,$extraOld) vs ($missNew,$extraNew)")

    println(f"""{"metric":"ivf_probe_profile","corpus_rows":$nRows,""" +
      f""""replicas":$reps,"seed_wide_takeordered_sec":$seedOld%.3f,""" +
      f""""seed_prefix_sec":$seedNew%.3f,""" +
      f""""seed_speedup":${seedOld / seedNew}%.2f,""" +
      f""""census_two_antijoins_sec":$censusOld%.3f,""" +
      f""""census_fullouter_sec":$censusNew%.3f,""" +
      f""""census_speedup":${censusOld / censusNew}%.2f,""" +
      f""""missing":$missNew,"extras":$extraNew,""" +
      f""""seeds_identical":true,"counts_identical":true}""")
    spark.stop()
  }
}
