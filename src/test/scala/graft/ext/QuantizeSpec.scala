package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("int8Codes: endpoints hit ±127, constant dims code 0, codes stay in range") {
    val emb = Seq(
      (1L, Array(0.0f, 10.0f, 7.0f)),
      (2L, Array(1.0f, 30.0f, 7.0f)),
      (3L, Array(0.5f, 20.0f, 7.0f))
    ).toDF("vec_id", "embedding")
    val codes = Quantize.int8Codes(emb).orderBy("vec_id")
      .as[(Long, Seq[Long])].collect().toMap
    assert(codes(1L) == Seq(-127L, -127L, 0L)) // per-dim minima (+ constant dim)
    assert(codes(2L) == Seq(127L, 127L, 0L))   // per-dim maxima
    assert(codes(3L)(0) == 0L)                 // midpoint: floor(0.5*254)-127 = 0
    assert(codes.values.flatten.forall(c => c >= -127L && c <= 127L))
  }

  test("ranking by int8-code dot product preserves the exact cosine top-k") {
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.topKBrute(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet

    val codes = Quantize.int8Codes(emb)
    val qc = codes.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("codes").as("qc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("neighbor_id").asc)
    val approx = qc.crossJoin(
        codes.select(col("vec_id").as("neighbor_id"), col("codes").as("cc")))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("qdot", aggregate(
        zip_with(col("qc"), col("cc"), (a, b) => a * b), lit(0L), _ + _))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the fixture is unit-normalized, so the integer code dot is a
    // monotone-ish proxy for cosine; 4x less memory should still find
    // most true neighbors
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall $recall too low")
  }

  test("int8Codes on the fixture corpus: reconstruction error within one step") {
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val stats = Quantize.dimStats(emb).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = Quantize.int8Codes(emb)
      .join(emb, "vec_id")
      .select(col("vec_id"), col("codes"), col("embedding"))
      .limit(50).collect()
    rows.foreach { r =>
      val codes = r.getSeq[Long](1)
      val xs = r.getSeq[Float](2)
      codes.indices.foreach { d =>
        val (mn, mx) = stats(d)
        if (mx > mn) {
          val step = (mx - mn) / 254.0
          val deq = mn + (codes(d) + 127L) * step
          assert(math.abs(xs(d) - deq) <= step + 1e-12,
            s"dim $d: x=${xs(d)} dequant=$deq step=$step")
        }
      }
    }
  }
}
