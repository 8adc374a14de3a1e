package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ext.TextOps

class TokenCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hostile = Seq(
    "",                       // empty: 0 tokens in every mode
    " ",                      // single space
    "   \t\n\r\f  ",    // every ASCII whitespace class char
    "one",                    // single token, no whitespace
    "a b  c",                 // double space => empty split tokens, 3 \S+ runs
    " leading and trailing ", // boundary runs
    "tabs\tand\nnewlines\rmixed",
    "digits123mixed456words",  // letter/digit run alternation
    "punct!@#, mid.sen-tence's", // punctuation singles
    "a b",               // non-breaking space is NOT ASCII \s => one \S+ run
    "café résumé", // 2-byte UTF-8 letters (non-ASCII => punct class)
    "emoji 😀 and 🎉 four-byte", // surrogate pairs, 4-byte UTF-8
    "ééé",     // adjacent multibyte punct chars count per code point
    "x".repeat(1000) + " " + "y".repeat(1000))

  test("all three modes equal their regex reference on hostile strings and the fixture corpus") {
    val fixture = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(col("text"))
    val all = hostile.toDF("text").union(fixture)
    val mismatches = all.select(
        TextOps.tokenCount(col("text")).as("ws_n"),
        TextOps.tokenCountRegex(col("text")).as("ws_r"),
        TextOps.punctCount(col("text")).as("p_n"),
        TextOps.punctCountRegex(col("text")).as("p_r"),
        TextOps.bpeTokenCount(col("text")).as("b_n"),
        TextOps.bpeTokenCountRegex(col("text")).as("b_r"))
      .filter(col("ws_n") =!= col("ws_r") or
        col("p_n") =!= col("p_r") or col("b_n") =!= col("b_r"))
    assert(mismatches.count() == 0)
  }

  test("null text yields NULL, matching the regex forms") {
    val row = Seq(Option.empty[String]).toDF("text")
      .select(TextOps.tokenCount(col("text")), TextOps.punctCount(col("text")),
        TextOps.bpeTokenCount(col("text")))
      .head()
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
  }

  test("known values") {
    val r = Seq("He said: \"42 cafés!\"").toDF("text")
      .select(TextOps.tokenCount(col("text")).as("ws"),
        TextOps.punctCount(col("text")).as("p"),
        TextOps.bpeTokenCount(col("text")).as("b"))
      .head()
    // \S+ runs: He | said: | "42 | cafés!" -> 4
    assert(r.getInt(0) == 4)
    // code points not alnum/ws: ':' '"' 'é' '!' '"' -> 5
    assert(r.getInt(1) == 5)
    // bpe: He, said, ':', '"', 42, caf, 'é', s, '!', '"' = 10
    assert(r.getInt(2) == 10)
  }

  test("the expression stays inside whole-stage codegen") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val plan = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(TextOps.tokenCount(col("text")).as("n"),
        TextOps.punctCount(col("text")).as("p"),
        TextOps.bpeTokenCount(col("text")).as("b"))
      .queryExecution.executedPlan
    // toString renders codegen spans as "*(n)"; assert the node is there
    assert(plan.find(_.isInstanceOf[WholeStageCodegenExec]).isDefined,
      plan.toString)
  }
}
