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

  test("probe plan never shuffles the corpus: no shuffle joins, no n2 broadcast") {
    // With size-based auto-broadcast disabled, any join left in the probe
    // must be a hinted broadcast of a BOUNDED side (centroids, probes).
    // The round-7 plan shuffle-joined corpus norms on neighbor_id and
    // broadcast the corpus-sized n2 table renamed to query_id — both now
    // replaced by inline integer norms, so the plan must contain NO
    // shuffle equi-join at all, and the only broadcasts are the two
    // bounded hints. The top-k must partially aggregate map-side.
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val idx = Ivf.buildIndex(emb, nLists = 8, iters = 0)
      val q = Ivf.probe(idx, queries, k = 5, nProbe = 4)
      graft.Bench.materialize(q)
      // AQE's toString prints the final plan AND the pre-adaptive initial
      // plan; judge only the final one
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"corpus-scale shuffle join in the probe plan:\n$plan")
      val nBroadcast = "BroadcastExchange".r.findAllMatchIn(plan).size
      assert(nBroadcast <= 2,
        s"expected only the centroid + probe-set broadcasts, got $nBroadcast:\n$plan")
      assert(plan.contains("partial_"),
        s"top-k did not partially aggregate map-side:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("queries outside the indexed corpus probe correctly (inline norms)") {
    // Round 7 required queries to be members of the corpus (their norm
    // was looked up in the index's n2 table — absent queries silently
    // dropped). Norms now compute inline from the query embedding, so an
    // external vector probes like any other: at full probe it must match
    // brute force over the corpus exactly, including the double cos_sim.
    val ext = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 50000L).as("vec_id"), col("embedding"))
    val idx = Ivf.buildIndex(emb, nLists = 4, iters = 0)
    val probed = Ivf.probe(idx, ext, k = 3, nProbe = 4)
      .orderBy("query_id", "rnk").collect().toSeq
    val brute = Similarity.topKBrute(emb, ext, 3)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(probed == brute && probed.size == 9)
    // an external identical copy finds its original at rank 1, cos == ~1
    val top = probed.filter(r => r.getLong(0) == 50000L && r.getLong(1) == 1L).head
    assert(top.getLong(2) == 0L)
    assert(math.abs(top.getDouble(3) - 1.0) < 1e-12)
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
