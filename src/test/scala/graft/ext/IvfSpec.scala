package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 5)

  test("training produces nLists centroids of the right dimension") {
    val cents = Ivf.train(emb, nLists = 8, iters = 1)
    assert(cents.size == 8)
    assert(cents.forall(_._2.size == 64))
    assert(cents.map(_._1).sorted == (0 until 8))
  }

  test("assignment covers every vector exactly once") {
    val cents = Ivf.train(emb, nLists = 8, iters = 1)
    val lists = Ivf.assign(emb, cents)
    assert(lists.count() == emb.count())
    assert(lists.select("vec_id").distinct().count() == emb.count())
    // every list id is a trained centroid
    val cids = lists.select("cid").distinct().as[Int].collect().toSet
    assert(cids.subsetOf((0 until 8).toSet))
  }

  test("probing more lists can only improve recall; both find neighbors") {
    val brute = Similarity.topKBrute(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(nProbe: Int): Double = {
      val ivf = Ivf.topKIvf(emb, queries, 5, nLists = 16, nProbe = nProbe)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (ivf & brute).size.toDouble / brute.size
    }
    val r2 = recall(2)
    val rAll = recall(16) // probing every list == exact search
    assert(rAll == 1.0, s"full probe must be exact, got $rAll")
    assert(r2 > 0.0)
    assert(rAll >= r2)
  }

  test("an index is built once and probed many times with consistent answers") {
    val idx = Ivf.buildIndex(emb, nLists = 16)
    val once = Ivf.probe(idx, queries, k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val again = Ivf.probe(idx, queries, k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(once == again && once.nonEmpty) // deterministic re-probe, no retrain
    val brute = Similarity.topKBrute(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(once == brute) // full probe of a prebuilt index is exact
  }

  test("incremental append: index + batch probes exactly like a full corpus") {
    val corpus = emb.filter(col("vec_id") >= 100)
    val batch = emb.filter(col("vec_id") < 100)
    val idx = Ivf.buildIndex(corpus, nLists = 16)
    val grown = Ivf.addToIndex(idx, batch)
    // every vector is in exactly one list after the append
    assert(grown.lists.count() == emb.count())
    assert(grown.lists.select("neighbor_id").distinct().count() == emb.count())
    // full probe of the grown index == brute force over the FULL corpus
    val probed = Ivf.probe(grown, queries, k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Similarity.topKBrute(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probed == brute)
    // the quantizer was NOT retrained by the append
    assert(grown.cents == idx.cents)
    // replay safety: re-appending the same batch changes nothing — an
    // at-least-once ingest must not double-index a vector
    val replayed = Ivf.addToIndex(grown, batch)
    assert(replayed.lists.count() == emb.count())
    val probedAgain = Ivf.probe(replayed, queries, k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probedAgain == probed)
  }

  test("streaming vector ingest: micro-batches append to the frozen index") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    // the production ingest loop: a file stream of new vectors, each
    // micro-batch assigned to the FROZEN quantizer and unioned into the
    // lists (addToIndex is replay-safe, so at-least-once is fine)
    val corpus = emb.filter(col("vec_id") >= 100)
    val d = java.nio.file.Files.createTempDirectory("graft-ivfstream").toString
    emb.filter(col("vec_id") < 50)
      .coalesce(1).write.mode("append").parquet(s"$d/in")
    emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
      .coalesce(1).write.mode("append").parquet(s"$d/in")
    var idx = Ivf.buildIndex(corpus, nLists = 16)
    val cents0 = idx.cents
    val q = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$d/in")
      .writeStream
      .foreachBatch((df: DataFrame, _: Long) => { idx = Ivf.addToIndex(idx, df); () })
      .option("checkpointLocation", s"$d/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(idx.cents == cents0) // quantizer never retrained mid-stream
    assert(idx.lists.count() == emb.count())
    val probed = Ivf.probe(idx, queries, k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Similarity.topKBrute(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probed == brute)
  }
}
