package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class LogHistogramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("buckets are floor(log2), hand-checked incl. powers of two") {
    val vals = Seq(1L, 2L, 3L, 4L, 7L, 8L, 255L, 256L, 1L << 40).toDF("x")
    val got = vals.select(LogHistogram.bucket(col("x"))).collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 1L, 2L, 2L, 3L, 7L, 8L, 40L))
  }

  test("out-of-domain values (<= 0) are dropped by the sketch") {
    val sk = LogHistogram.sketch(Seq(-4L, 0L, 1L, 2L).toDF("x"), "x")
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sk == Seq((0L, 1L), (1L, 1L)))
  }

  test("merge by addition: half sketches summed equal the whole sketch") {
    val df = (1L to 1000L).toDF("x")
    val whole = LogHistogram.sketch(df, "x")
    val merged = LogHistogram.sketch(df.filter(col("x") % 2 === 0), "x")
      .unionAll(LogHistogram.sketch(df.filter(col("x") % 2 === 1), "x"))
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(merged) == m(whole))
  }

  test("quantiles: permille thresholds hit the documented buckets") {
    // 1..1000: p500 -> ceil(500) = 500 -> bucket 8 (256..511 covers
    // cumulative 256..511; cum(bucket 8) = 511 >= 500); p990 -> 990 ->
    // bucket 9 (cum 1000 >= 990, cum(8) = 511 < 990)
    val sk = LogHistogram.sketch((1L to 1000L).toDF("x"), "x")
    val qs = LogHistogram.quantiles(sk, Seq(500, 990)).orderBy("permille")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(qs == Seq((500L, 8L, 256L), (990L, 9L, 512L)))
    // relative-error contract: true p500 = 500, est 256, 256 <= 500 < 512
  }

  test("permille 1000 selects the max bucket; single-bucket data is trivial") {
    val sk = LogHistogram.sketch(Seq(9L, 10L, 15L).toDF("x"), "x")
    val q = LogHistogram.quantiles(sk, Seq(1, 1000)).orderBy("permille")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(q == Seq((1L, 3L), (1000L, 3L)))
  }
}
