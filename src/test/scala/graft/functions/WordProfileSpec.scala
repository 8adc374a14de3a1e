package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ext.TextOps

class WordProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Stop = graft.ext.TextStats.Stopwords

  private val hostile = Seq(
    "",                        // split('') = [""] -> 1 token, 1 uniq
    " ",                       // ["",""] -> 2 tokens, 1 uniq
    "   ",                     // separator run: 4 empty tokens, 1 uniq
    "the",                     // exact stopword
    "the the the",             // repeated stopword: 3 tok, 1 uniq, 3 hits
    "The THE the,",            // case + punctuation variants: 1 hit only
    " leading and trailing ",  // boundary empties count as tokens
    "a b  c",                  // double space -> embedded empty token
    "a b",                // NBSP is not the separator: one token "a\u00a0b"
    "café café résumé",        // multibyte equality and distinctness
    "emoji 😀 and 😀 again",   // 4-byte UTF-8, duplicate emoji token
    "theo of office in2 to",   // near-miss words: only "of"/"to" hit
    ("tok " * 500).trim,       // 500 equal tokens: table probe collisions
    (1 to 500).map("w" + _).mkString(" ")) // 500 distinct tokens

  private def profiled = {
    val p = col("_p")
    hostile.toDF("text")
      .union(spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
        .select(col("text")))
      .withColumn("_p", call_function("word_profile", col("text"),
        lit(Stop.mkString(",")), lit(true)))
      .withColumn("_w", TextOps.words(col("text")))
      .select(col("text"),
        p.getField("n_tok").as("n_tok"),
        p.getField("n_uniq").as("n_uniq"),
        element_at(p.getField("hits"), 1).as("hits"),
        p.getField("ws_runs").as("ws_runs"),
        p.getField("punct").as("punct"),
        size(col("_w")).as("ref_tok"),
        size(array_distinct(col("_w"))).as("ref_uniq"),
        TextOps.countIn(col("_w"), Stop).as("ref_hits"),
        TextOps.tokenCountRegex(col("text")).as("ref_ws"),
        TextOps.punctCountRegex(col("text")).as("ref_punct"))
  }

  test("n_tok/n_uniq/hits/ws_runs/punct equal their references on hostile strings and the fixture corpus") {
    val mismatches = profiled.filter(col("n_tok") =!= col("ref_tok") or
      col("n_uniq") =!= col("ref_uniq") or col("hits") =!= col("ref_hits") or
      col("ws_runs") =!= col("ref_ws") or col("punct") =!= col("ref_punct"))
    assert(mismatches.count() == 0, mismatches.take(5).mkString("\n"))
  }

  test("multi-group spec counts each vocab independently; with_uniq=false skips the table") {
    val spec = "the,a|of,and|zzz"
    val p = col("_p")
    val r = Seq("the a of the and zzz nope").toDF("text")
      .withColumn("_p", call_function("word_profile", col("text"), lit(spec), lit(false)))
      .select(p.getField("n_tok"), p.getField("n_uniq"), p.getField("hits"))
      .head()
    assert(r.getInt(0) == 7)
    assert(r.getInt(1) == -1) // uniq disabled
    assert(r.getSeq[Int](2) == Seq(3, 2, 1))
  }

  test("null text yields a NULL struct, matching split's propagation") {
    val row = Seq(Option.empty[String]).toDF("text")
      .select(call_function("word_profile", col("text"),
        lit(Stop.mkString(",")), lit(true)).as("p"))
      .head()
    assert(row.isNullAt(0))
  }

  test("the profiled projection stays inside whole-stage codegen") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val plan = graft.ext.TextStats.stats(
        spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet"))
      .queryExecution.executedPlan
    assert(plan.find(_.isInstanceOf[WholeStageCodegenExec]).isDefined,
      plan.toString)
  }

  test("word_profile is evaluated once per operator, not once per field reference") {
    // CollapseProject must not inline the staged _p into its four field
    // extracts — count WordProfile nodes in the optimized stats() plan
    val optimized = graft.ext.TextStats.stats(
        spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet"))
      .queryExecution.optimizedPlan
    val n = optimized.collect { case node =>
      node.expressions.map(_.collect { case w: WordProfile => w }.size).sum
    }.sum
    assert(n == 1, s"expected a single WordProfile evaluation, got $n:\n$optimized")
  }
}
