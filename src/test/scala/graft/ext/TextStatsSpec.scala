package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "the cat and the dog"),
    (2L, "de", "x"),
  ).toDF("doc_id", "lang", "text")

  test("stats: token counts, distinct counts, stopword ratio") {
    val r = TextStats.stats(docs).orderBy("doc_id").collect()
    val d1 = r(0)
    assert(d1.getAs[Int]("n_tok") == 5)
    assert(d1.getAs[Int]("n_uniq") == 4)        // 'the' twice
    assert(d1.getAs[Int]("tok_chars") == 15)    // 3+3+3+3+3
    assert(d1.getAs[Double]("stop_ratio") == 3.0 / 5.0) // the, and, the
    val d2 = r(1)
    assert(d2.getAs[Int]("n_tok") == 1 && d2.getAs[Double]("stop_ratio") == 0.0)
  }

  test("langId: stopword-majority vote with deterministic tie-break") {
    val d = Seq(
      (1L, "en", "the cat and a dog of note"),
      (2L, "de", "der hund und die katze"),
      (3L, "zh", "xyz abc")).toDF("doc_id", "lang", "text")
    val r = TextStats.langId(d).orderBy("doc_id")
      .select("pred_lang").as[String].collect().toSeq
    assert(r == Seq("en", "de", "und"))
  }

  test("quality score stays in [0,1] over the fixture corpus") {
    val fixture = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val mm = TextStats.qualityScore(fixture)
      .agg(min("score"), max("score")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("rolling fingerprint is order-sensitive; md5 fingerprint is not") {
    val d = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val r = TextStats.fingerprints(d).orderBy("doc_id").collect()
    assert(r(0).getAs[String]("fp_md5") != r(1).getAs[String]("fp_md5"))
    assert(r(0).getAs[Long]("fp_roll") != r(1).getAs[Long]("fp_roll"))
    val same = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val s = TextStats.fingerprints(same).collect()
    assert(s(0).getAs[Long]("fp_roll") == s(1).getAs[Long]("fp_roll"))
  }

  test("vocab-side joins are shuffle joins, not forced broadcasts") {
    // At 100 TB the unigram/df tables are vocabulary-sized (1e8-1e9
    // rows) — a forced broadcast would kill the job. With size-based
    // auto-broadcast disabled, the ONLY way a BroadcastHashJoin can
    // appear is a hint in the operator code; assert there is none.
    // (The one-row corpus-total cross joins legitimately broadcast via
    // BroadcastNestedLoopJoin — those are bounded by construction.)
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fixture = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      for (q <- Seq(TextStats.collocations(fixture, 2L),
                    TextStats.topTermsByRarity(fixture, 3))) {
        graft.Bench.materialize(q)
        val plan = q.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastHashJoin"),
          s"vocab join was force-broadcast:\n$plan")
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"expected a shuffle equi-join on the vocab side:\n$plan")
      }
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bpe token count: letter runs, digit runs, punctuation marks") {
    val d = Seq((1L, "hello world42 x-y!")).toDF("doc_id", "text")
    val n = d.select(TextOps.bpeTokenCount(col("text"))).as[Int].head()
    // hello | world | 42 | x | - | y | !
    assert(n == 7)
  }
}
