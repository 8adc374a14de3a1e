package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ext.TextOps

/** The byte-scan n-gram builder must be value-identical (content AND
  * order, duplicates preserved) to the interpreted reference chain —
  * `transform(sequence(1, size(w)-n+1), i => concat_ws(" ", slice(w, i,
  * n)))` guarded to empty for docs shorter than n words. */
class WordNgramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference(n: Int): Column = {
    val w = TextOps.words(col("text"))
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - lit(n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  private def check(texts: Seq[String], n: Int): Unit = {
    val rows = texts.toDF("text").select(
        call_function("word_ngrams", col("text"), lit(n)).as("native"),
        reference(n).as("ref"))
      .as[(Seq[String], Seq[String])].collect()
    rows.zip(texts).foreach { case ((nat, ref), t) =>
      assert(nat == ref, s"mismatch on '${t.take(60)}' n=$n")
    }
  }

  test("hostile strings: spaces, empties, unicode, short docs, duplicates") {
    val hostiles = Seq(
      "", " ", "   ",
      "a", "a b", "a b c", "a b c d e",
      " leading", "trailing ", "double  space",
      "dup dup dup dup",          // duplicate windows preserved
      "café naïve résumé déjà vu",
      "emoji 😀 mid 😀 emoji",
      "tab\tinside token stays")
    for (n <- Seq(1, 2, 3, 5)) check(hostiles, n)
  }

  test("fixture corpus agrees at n=2 (the collocations shape)") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val bad = docs.select(
        call_function("word_ngrams", col("text"), lit(2)).as("native"),
        reference(2).as("ref"))
      .filter(not(col("native") === col("ref"))).count()
    assert(bad == 0L)
  }

  test("null text yields null; codegen span holds") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val r = Seq[Option[String]](None, Some("a b")).toDF("text")
      .select(call_function("word_ngrams", col("text"), lit(2))).collect()
    assert(r(0).isNullAt(0) && !r(1).isNullAt(0))
    val plan = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(call_function("word_ngrams", col("text"), lit(2)).as("g"))
      .queryExecution.executedPlan
    assert(plan.find(_.isInstanceOf[WholeStageCodegenExec]).isDefined,
      plan.toString)
  }
}
