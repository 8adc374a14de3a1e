package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ext.{TextOps, TextStats}

class WordCountsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hostile = Seq(
    "",                        // split('') = [""] -> one empty term, cnt 1
    " ",                       // ["",""] -> empty term, cnt 2
    "   ",                     // separator run: empty term, cnt 4
    "the the the",             // one term, cnt 3
    " leading and trailing ",  // boundary empties are terms
    "a b  c",                  // embedded empty token
    "a b",                // NBSP is not the separator
    "café café résumé",        // multibyte equality and distinctness
    "emoji 😀 and 😀 again",   // 4-byte UTF-8 duplicate
    ("tok " * 500).trim,       // 500 equal tokens: probe collisions
    (1 to 500).map("w" + _).mkString(" ")) // 500 distinct tokens

  private def corpus = hostile.toDF("text")
    .union(spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(col("text")))
    .withColumn("id", monotonically_increasing_id())

  test("word_counts equals the split+groupBy reference on hostile strings and the fixture corpus") {
    val native = corpus.select(col("id"),
        explode(call_function("word_counts", col("text"))).as("tc"))
      .select(col("id"), col("tc.term").as("term"), col("tc.cnt").as("cnt"))
    val ref = corpus.select(col("id"),
        explode(TextOps.words(col("text"))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).cast("int").as("cnt"))
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty,
      native.exceptAll(ref).take(5).mkString("\n") + "\n---\n" +
        ref.exceptAll(native).take(5).mkString("\n"))
  }

  test("null text yields a NULL array, matching split's propagation") {
    val row = Seq(Option.empty[String]).toDF("text")
      .select(call_function("word_counts", col("text")).as("c"))
      .head()
    assert(row.isNullAt(0))
  }

  test("topTermsByRarity equals the window-ranked reference formulation") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val k = 3
    val tf = docs.select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_scaled").desc, col("term").asc)
    val ref = tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_scaled", expr("(tf * n_docs * 1000000L) div df"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("score_scaled"))
    val got = TextStats.topTermsByRarity(docs, k)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      got.exceptAll(ref).take(5).mkString("\n") + "\n---\n" +
        ref.exceptAll(got).take(5).mkString("\n"))
  }

  test("topTermsByRarity plan: no window, partial aggregation before the doc exchange") {
    // string-walk the plan (collect() does not descend into the
    // AdaptiveSparkPlan wrapper, the same reason TextStatsSpec's join
    // census reads the toString)
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val plan = TextStats.topTermsByRarity(docs, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no ranking window:\n$plan")
    // the heap UDAF must partially aggregate (map-side combine to <= k
    // rows per (partition, doc) before the doc_id exchange)
    assert(plan.contains("partial_topktermagg"),
      s"expected a partial topktermagg stage:\n$plan")
  }

  test("the tf table materializes shuffle-free from the scan") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val tf = docs.select(col("doc_id"),
        explode(call_function("word_counts", col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.term"), col("tc.cnt"))
    val plan = tf.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-doc term counts must not shuffle:\n$plan")
  }
}
