package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Similarity.{dotScaled, norms}

/** IVF (inverted-file) approximate nearest neighbors — the second scale
  * path next to hyperplane LSH: a coarse quantizer of `nLists` centroids
  * is trained with a few Lloyd iterations of DISTRIBUTED k-means (each
  * iteration is one assign job + one per-dimension mean job; only the
  * k x dim centroid matrix ever reaches the driver), every vector is
  * assigned to its nearest centroid's list, and a query ranks exactly
  * only within its `nProbe` nearest lists — |probed lists| / |all lists|
  * of the corpus instead of all of it.
  *
  * Centroid means use float averages, so centroids (and therefore
  * recall, not correctness) can drift in the last bits across cluster
  * layouts — the exact verify inside the probed lists is unaffected.
  */
object Ivf {

  private def centroidDf(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[(Int, Seq[Float])]): DataFrame = {
    import spark.implicits._
    cents.toDF("cid", "cvec")
  }

  /** (vec_id, cid): each vector's nearest centroid by dot product
    * (≡ nearest by L2 for normalized vectors). `max_by` over a
    * (dot, -cid) ordering struct instead of a row_number window: the
    * aggregate gets map-side partial combine, so only N rows shuffle
    * instead of ranking the full N x k cross product. */
  def assign(emb: DataFrame, cents: Seq[(Int, Seq[Float])]): DataFrame =
    emb.crossJoin(broadcast(centroidDf(emb.sparkSession, cents)))
      .withColumn("dot", dotScaled(col("embedding"), col("cvec")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("dot"), (-col("cid")).as("nc"))).as("cid"))

  /** Lloyd iterations: seed with the first `nLists` vectors (by vec_id —
    * deterministic), then alternate assign / per-dimension mean. */
  def train(emb: DataFrame, nLists: Int, iters: Int = 2): Seq[(Int, Seq[Float])] = {
    var cents: Seq[(Int, Seq[Float])] =
      emb.orderBy(col("vec_id")).limit(nLists).collect().toSeq
        .zipWithIndex.map { case (r, i) =>
          i -> r.getAs[scala.collection.Seq[Float]]("embedding").toSeq
        }
    (1 to iters).foreach { _ =>
      val assigned = assign(emb, cents)
        .join(emb, "vec_id")
        .select(col("cid"), posexplode(col("embedding")))
      val means = assigned.groupBy(col("cid"), col("pos"))
        .agg(avg(col("col").cast("double")).as("m"))
        .collect()
        .groupBy(_.getAs[Int]("cid"))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getAs[Int]("pos"))
            .map(_.getAs[Double]("m").toFloat).toSeq
        }
      // a list that lost every member keeps its previous centroid
      cents = cents.map { case (cid, old) => cid -> means.getOrElse(cid, old) }
    }
    cents
  }

  /** A built IVF index: the trained coarse quantizer plus the
    * materialized inverted lists and norms — built ONCE, probed many
    * times (the production shape: index build is the expensive corpus
    * pass; queries only pay the probe). `lists`/`n2` are checkpointed so
    * repeated probes never re-run training or assignment. */
  final case class Index(
      cents: Seq[(Int, Seq[Float])],
      lists: DataFrame, // (neighbor_id, cid, ce = embedding)
      n2: DataFrame)    // (vec_id, n2)

  /** One corpus pass: train the quantizer, assign every vector to its
    * list, materialize lists + norms. */
  def buildIndex(emb: DataFrame, nLists: Int = 16, iters: Int = 2): Index = {
    val cents = train(emb, nLists, iters)
    val lists = assign(emb, cents)
      .join(emb, "vec_id")
      .select(col("vec_id").as("neighbor_id"), col("cid"),
        col("embedding").as("ce"))
      .localCheckpoint(true)
    Index(cents, lists, norms(emb).localCheckpoint(true))
  }

  /** Append a batch to an existing index WITHOUT retraining: arriving
    * vectors are assigned to the FROZEN coarse quantizer and unioned
    * into the inverted lists — the production ingest shape (the corpus
    * pass built the index once; each batch pays one assign job that
    * scales with the batch). Recall characteristics remain those of the
    * original quantizer; retrain when distribution drift matters. */
  def addToIndex(index: Index, batch: DataFrame): Index = {
    // replay-safe: an at-least-once ingest can resend vectors already
    // indexed; a duplicate list row would make probe() emit the same
    // neighbor at two ranks and silently evict the true k-th answer
    val fresh = batch.join(
        index.lists.select(col("neighbor_id").as("vec_id")),
        Seq("vec_id"), "left_anti")
      .localCheckpoint(true)
    val lists = assign(fresh, index.cents)
      .join(fresh, "vec_id")
      .select(col("vec_id").as("neighbor_id"), col("cid"),
        col("embedding").as("ce"))
      .unionByName(index.lists)
      .localCheckpoint(true)
    Index(index.cents,
      lists,
      norms(fresh).unionByName(index.n2).localCheckpoint(true))
  }

  /** Probe an existing index: rank by exact scaled-integer cosine inside
    * the `nProbe` nearest lists only. */
  def probe(index: Index, queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("cid").asc)
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(centroidDf(spark, index.cents)))
      .withColumn("dot", dotScaled(col("qe"), col("cvec")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qe"), col("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    probes.join(index.lists, "cid")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("dots", dotScaled(col("qe"), col("ce")))
      .join(broadcast(index.n2.select(col("vec_id").as("query_id"), col("n2").as("nq2"))),
        "query_id")
      .join(index.n2.select(col("vec_id").as("neighbor_id"), col("n2").as("nc2")),
        "neighbor_id")
      .withColumn("cos_sim",
        col("dots").cast("double") /
          sqrt(col("nq2").cast("double") * col("nc2").cast("double")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos_sim"))
  }

  /** Approximate top-k: build + probe in one call (the one-shot path the
    * coverage queries use; long-lived pipelines hold the [[Index]]). */
  def topKIvf(emb: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame =
    probe(buildIndex(emb, nLists, iters), queries, k, nProbe)
}
