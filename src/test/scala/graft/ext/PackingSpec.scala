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

  test("property: offsets tile every stream exactly for arbitrary corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf("a", "bb", "ccc", "dddd")
    val text = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 4L), text)))
    val prop = Prop.forAllNoShrink(corpus, Gen.chooseNum(1, 16)) { (rows, c) =>
      val docs = rows.zipWithIndex
        .map { case ((src, t), i) => (i.toLong, s"s$src", t) }
        .toDF("doc_id", "source", "text")
      val packed = Packing.concatChunk(docs, "source", c).collect()
      packed.groupBy(_.getString(1)).forall { case (_, rs) =>
        val byId = rs.sortBy(_.getLong(0))
        // offset chain tiles exactly AND bins never precede offsets
        byId.head.getLong(3) == 0L &&
          byId.sliding(2).forall {
            case Array(a, b) => b.getLong(3) == a.getLong(3) + a.getLong(2)
            case _ => true
          } &&
          byId.forall(r => r.getLong(4) == r.getLong(3) / c &&
            r.getLong(5) == (r.getLong(3) + math.max(r.getLong(2) - 1, 0)) / c)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("hierarchical offsets: one giant stream packs across many blocks, identically") {
    import org.apache.spark.sql.functions.lit
    // force the worst case — the WHOLE corpus is a single stream — and
    // pack with 64-id blocks (8 blocks at sf0.001): the block-local
    // cumsums + block-base join must reproduce the one-window answer
    // bit for bit, while the heavy per-doc pass partitions by block
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .withColumn("one", lit("all"))
    val fine = Packing.concatChunk(docs, "one", c = 256, idBlock = 64L)
    val coarse = Packing.concatChunk(docs, "one", c = 256) // single block
    assert(fine.orderBy("doc_id").collect().toSeq ==
      coarse.orderBy("doc_id").collect().toSeq)
    // the per-doc window's exchange hashes on (stream, _blk), not the
    // stream alone — that's the partition-parallelism claim
    val plan = fine.queryExecution.executedPlan.toString
    assert(plan.contains("_blk"), s"expected block-partitioned window:\n$plan")
  }

  test("windows: every bin fills to exactly c (stream-final excepted) and rebuilds each doc") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val c = 256
    val w = Packing.windows(docs, "source", c).collect()
    val lastBin = w.groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getLong(1)).max }
    w.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case ((s, b), rs) =>
      val total = rs.map(_.getLong(4)).sum
      if (b < lastBin(s)) assert(total == c, s"bin ($s,$b) holds $total")
      else assert(total <= c)
    }
    // per doc: slices in bin order tile [0, n_tok) — nothing lost, nothing doubled
    val counts = Packing.concatChunk(docs, "source", c).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    w.groupBy(_.getLong(2)).foreach { case (doc, rs) =>
      val slices = rs.sortBy(_.getLong(1)).map(r => (r.getLong(3), r.getLong(4))).toSeq
      assert(slices.head._1 == 0L)
      slices.sliding(2).foreach {
        case Seq((s1, l1), (s2, _)) => assert(s2 == s1 + l1)
        case _ =>
      }
      assert(slices.map(_._2).sum == counts(doc), s"doc $doc")
    }
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
