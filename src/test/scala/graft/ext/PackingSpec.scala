package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("concat-and-chunk: offsets accumulate per stream, docs span bin boundaries") {
    // stream A: 6 + 3 + 4 tokens at capacity 8 -> doc 2 starts at 6 and
    // spans the bin-0/bin-1 boundary; doc 3 sits entirely in bin 1
    val docs = Seq(
      (1L, "A", "a b c d e f"),
      (2L, "A", "g h i"),
      (3L, "A", "j k l m"),
      (10L, "B", "x y"),   // stream B restarts at offset 0
      (11L, "B", "")       // empty doc: zero tokens at its offset
    ).toDF("doc_id", "source", "text")
    val out = Packing.concatChunk(docs, "source", c = 8)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out(1L) == ((6L, 0L, 0L, 0L)))
    assert(out(2L) == ((3L, 6L, 0L, 1L)))  // spans bins 0..1
    assert(out(3L) == ((4L, 9L, 1L, 1L)))
    assert(out(10L) == ((2L, 0L, 0L, 0L))) // independent stream
    assert(out(11L) == ((0L, 2L, 0L, 0L)))
  }

  test("no token is lost or duplicated: bin spans tile the stream exactly") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val packed = Packing.concatChunk(docs, "source", c = 256).collect()
    packed.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val byId = rows.sortBy(_.getLong(0))
      // each doc starts exactly where the previous ended
      byId.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) == a.getLong(3) + a.getLong(2)) // offset chain
        case _ =>
      }
    }
  }
}
