package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 5)

  test("dotScaled is exact and symmetric on known vectors") {
    val df = Seq((Array(1.0f, 0.5f, 0.0f), Array(2.0f, 4.0f, 9.0f)))
      .toDF("a", "b")
    val d = df.select(Similarity.dotScaled(col("a"), col("b"))).as[Long].head()
    assert(d == 4000000000000000L) // (1*2 + 0.5*4 + 0*9) * 1e15
    val d2 = df.select(Similarity.dotScaled(col("b"), col("a"))).as[Long].head()
    assert(d == d2)
  }

  test("bounded-heap UDAF top-k equals the brute-force window top-k") {
    val brute = Similarity.topKBrute(emb, queries, 5)
      .orderBy("query_id", "rnk").collect().toSeq
    val agg = Similarity.topKAgg(emb, queries, 5)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(brute == agg) // identical rows INCLUDING the double cos_sim
    assert(brute.size == 25)
  }

  test("top-k ranking is deterministic: rank 1 strictly best, ids break ties") {
    val rows = Similarity.topKBrute(emb, queries, 5).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      val sims = byRank.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    }
  }

  test("ANN candidates rank by exact cosine and overlap the true top-k") {
    val ann = Similarity.topKAnn(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = Similarity.topKBrute(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // approximate: must find a meaningful share of the true neighbors
    val recall = (ann & brute).size.toDouble / brute.size
    assert(recall >= 0.2, s"ANN recall $recall too low")
    assert(ann.nonEmpty)
  }

  test("degenerate 1-band/0-bit ANN config is exact: equals brute force row-for-row") {
    val exact = Similarity.topKAnn(emb, queries, 5, nBands = 1, bandBits = 0)
      .orderBy("query_id", "rnk").collect().toSeq
    val brute = Similarity.topKBrute(emb, queries, 5)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(exact == brute) // identical rows INCLUDING the double cos_sim
  }

  test("cosine of a vector with itself is exactly 1.0") {
    val one = emb.filter(col("vec_id") === 0)
    val self = Similarity.cosinePairs(
      one.select(col("vec_id") + 1000 as "vec_id", col("embedding"),
        col("label")).unionByName(one),
      one)
    val c = self.filter(col("neighbor_id") === 1000).select("cos_sim").as[Double].head()
    assert(c == 1.0) // dot == norm product exactly at integer scale
  }

  test("hardNegatives: planted near-dups are excluded from the mined band; threshold 1.0 degenerates to brute top-k") {
    val e = emb.select(col("vec_id"), col("embedding"))
    val pert = e.filter(col("vec_id") < 5)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          x => (x.cast("double") * lit(1.01d)).cast("float")).as("embedding"))
    val base = e.unionByName(pert)
    val anchors = e.filter(col("vec_id") < 5)
    // without the band, every anchor's rank-1 is its own planted copy
    val unbanded = Similarity.topKBrute(base, anchors, 1).collect()
    unbanded.foreach(r => assert(
      r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") + 10000,
      "fixture sanity: the copy must dominate the unbanded ranking"))
    // with the band, no mined negative is a near-dup and no copy appears
    val mined = Similarity.hardNegatives(base, anchors, 5, 0.95).collect()
    assert(mined.length == 25)
    assert(mined.forall(_.getAs[Double]("cos_sim") < 0.95))
    assert(mined.forall(_.getAs[Long]("neighbor_id") < 10000),
      "planted copies must never be mined as negatives")
    // threshold 1.0 on the raw corpus (max pairwise cos 0.51) = topKBrute
    val atOne = Similarity.hardNegatives(e, anchors, 5, 1.0)
      .withColumnRenamed("anchor_id", "query_id")
      .orderBy("query_id", "rnk").collect().toSeq
    val brute = Similarity.topKBrute(e, anchors, 5)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(atOne == brute)
  }

  test("TopKAgg/TopKLongAgg full-buffer fast path == brute sort on adversarial sequences") {
    val rnd = new scala.util.Random(7)
    // duplicate scores force the tie-break through both the fast-path
    // comparison and the trim sort; ascending/descending runs hit the
    // always-skip and never-skip extremes
    val seqs = Seq(
      (1 to 200).map(i => Similarity.Scored(i.toLong, (i % 13) / 13.0)),
      (1 to 200).map(i => Similarity.Scored(i.toLong, i / 200.0)),
      (1 to 200).map(i => Similarity.Scored(i.toLong, 1.0 - i / 200.0)),
      (1 to 200).map(_ => Similarity.Scored(rnd.nextInt(50).toLong, rnd.nextInt(9) / 9.0)))
    for (s <- seqs; k <- Seq(1, 5, 50)) {
      val agg = new Similarity.TopKAgg(k)
      val got = s.foldLeft(agg.zero)(agg.reduce).items
      val want = s.sortBy(x => (-x.cos, x.cid)).take(k)
      assert(got == want, s"k=$k")
      val aggL = new Similarity.TopKLongAgg(k)
      val sL = s.map(x => Similarity.ScoredL(x.cid, (x.cos * 1e15).toLong))
      val gotL = sL.foldLeft(aggL.zero)(aggL.reduce).items
      val wantL = sL.sortWith((a, b) => a.s > b.s || (a.s == b.s && a.cid < b.cid)).take(k)
      assert(gotL == wantL, s"k=$k long")
    }
  }
}
