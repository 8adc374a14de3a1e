package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the ed ≤ 2 fuzzy self-join on the dense
  * adversarial corpus (the [[MinhashProfile]] discipline applied to the
  * board's dominant row) — attributes `q_fuzzy_join_ed2`'s wall time to
  * its stages (signature build, SMJ enumeration, candidate distinct,
  * verify) and times candidate PIPELINE VARIANTS side by side, so the
  * residue VERDICT r15 item 1 targets is cut where it actually is,
  * not where it is guessed to be.
  *
  * Usage: runMain graft.Ed2Profile [nNames] [k]  (default 15000 = sf0.1,
  * k = 2). k = 1 runs the census + production-pipeline legs only — the
  * counted-output-bound adjudication for the ed ≤ 1 family (the stage
  * decomposition below is the ed ≤ 2 pipeline's anatomy).
  */
object Ed2Profile {
  def main(a: Array[String]): Unit = {
    val n = a.headOption.map(_.toLong).getOrElse(15000L)
    val k = if (a.length > 1) a(1).toInt else 2
    val spark = Sessions.build(Sessions.cpusFromEnv, "ed2-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val names = spark.range(1L, n + 1L)
      .select(format_string("Customer#%09d", col("id")).as("name"))
      .localCheckpoint()

    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"PROF $name ${(System.nanoTime - s) / 1e9}%.2f s"); r
    }

    import graft.ext.FuzzyJoin
    // census: exact enumeration volume, no join
    val (sigRows, nBuckets, maxB, candPairs) =
      t("census")(FuzzyJoin.sigCensus(names, "name", k))
    println(s"PROF sig_rows=$sigRows buckets=$nBuckets max_bucket=$maxB " +
      s"cand_pairs=$candPairs")

    // the production pipeline, cold, twice (jit/cache warmth check)
    t("selfJoinEdK_cold") {
      println("PROF n_pairs " +
        FuzzyJoin.selfJoinEdK(names, "name", k).count())
    }
    t("selfJoinEdK_warm") {
      FuzzyJoin.selfJoinEdK(names, "name", k).count()
    }
    if (k != 2) { spark.stop(); sys.exit(0) }

    // ---- stage decomposition of the current shape ----
    val sigs = FuzzyJoin.sigTable(names, "name", "k", 2).persist()
    t("sigTable(materialize)")(sigs.count())
    val aS = sigs.select(col("k").as("key_a"), col("sig_h"))
    val bS = sigs.select(col("k").as("key_b"), col("sig_h"))
    val enum0 = aS.join(bS.hint("merge"), Seq("sig_h"))
      .where(col("key_a") < col("key_b"))
    t("enumerate_only")(println("PROF enum_rows " + enum0.count()))
    val dist0 = enum0.select(col("key_a"), col("key_b")).distinct()
    t("enumerate+distinct")(println("PROF dist_cands " + dist0.count()))
    t("enumerate+distinct+verify") {
      println("PROF verified " + dist0
        .where(abs(length(col("key_a")) - length(col("key_b"))) <= 2)
        .where(levenshtein(col("key_a"), col("key_b")) <= 2).count())
    }
    // verify BEFORE distinct: more levenshtein calls, smaller distinct
    t("enumerate+verify+distinct") {
      println("PROF verified_dup_rows " + enum0
        .where(abs(length(col("key_a")) - length(col("key_b"))) <= 2)
        .where(levenshtein(col("key_a"), col("key_b")) <= 2)
        .select(col("key_a"), col("key_b")).distinct().count())
    }
    sigs.unpersist(blocking = true)

    // ---- int-keyed variant: enumerate/distinct 16-byte pairs, join
    // names back only for the verified-candidate tail ----
    val keyed = names.distinct()
      .select(col("name"), xxhash64(col("name")).as("kid"))
      .localCheckpoint() // kid assignment outside the timed region
    val ksigs = keyed
      .select(col("kid"), explode(graft.ext.FuzzyJoin
        .deletionSigs2(col("name"))).as("sig"))
      .select(col("kid"), xxhash64(col("sig")).as("sig_h"))
      .distinct().persist()
    t("int_sigTable(materialize)")(ksigs.count())
    val aI = ksigs.select(col("kid").as("ka"), col("sig_h"))
    val bI = ksigs.select(col("kid").as("kb"), col("sig_h"))
    val enumI = aI.join(bI.hint("merge"), Seq("sig_h"))
      .where(col("ka") < col("kb"))
    val distI = enumI.select(col("ka"), col("kb")).distinct()
    t("int_enumerate+distinct")(println("PROF int_dist " + distI.count()))
    t("int_full_with_nameback") {
      val an = keyed.select(col("kid").as("ka"), col("name").as("key_a"))
      val bn = keyed.select(col("kid").as("kb"), col("name").as("key_b"))
      println("PROF int_verified " + distI
        .join(broadcast(an), "ka").join(broadcast(bn), "kb")
        .where(abs(length(col("key_a")) - length(col("key_b"))) <= 2)
        .where(levenshtein(col("key_a"), col("key_b")) <= 2).count())
    }
    ksigs.unpersist(blocking = true)
    spark.stop(); sys.exit(0)
  }
}
