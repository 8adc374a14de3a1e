package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ext.Quantize

class IntDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codegen int_dot equals the HOF formulation on fixture code pairs") {
    val codes = Quantize.int8Codes(
      spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet"))
    val pairs = codes.select(col("vec_id").as("ai"), col("codes").as("a"))
      .join(codes.select(col("vec_id").as("bi"), col("codes").as("b")),
        col("ai") < col("bi") && col("ai") < 30 && col("bi") < 60)
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val mismatches = pairs.select(
        expr("int_dot(a, b)").as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("null semantics mirror zip_with: null array/element or length mismatch -> NULL") {
    val mismatch = Seq((Array(1L), Array(2L, 3L))).toDF("a", "b")
      .select(expr("int_dot(a, b)")).head()
    assert(mismatch.isNullAt(0))
    val withNullElem = Seq((Array[java.lang.Long](1L, null), Array[java.lang.Long](2L, 3L)))
      .toDF("a", "b").select(expr("int_dot(a, b)")).head()
    assert(withNullElem.isNullAt(0))
    val nullArray = Seq((Array(1L), Option.empty[Array[Long]])).toDF("a", "b")
      .select(expr("int_dot(a, b)")).head()
    assert(nullArray.isNullAt(0))
  }

  test("known value") {
    val d = Seq((Array(2L, -3L, 5L), Array(7L, 11L, 13L))).toDF("a", "b")
      .select(expr("int_dot(a, b)")).as[Long].head()
    assert(d == 2 * 7 - 3 * 11 + 5 * 13)
  }

  test("whole-stage codegen accepts the generated loop (no fallback)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val df = spark.range(100)
      .select(array(col("id"), col("id") * 2, col("id") * 3).as("a"),
        array(col("id") + 1, col("id") * 5, lit(7L)).as("b"))
    val plan = df.select(expr("int_dot(a, b)"))
      .queryExecution.executedPlan
    assert(plan.find(_.isInstanceOf[WholeStageCodegenExec]).isDefined,
      plan.toString)
  }
}
