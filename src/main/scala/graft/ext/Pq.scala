package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Similarity.dotScaled

/** Product quantization — the codebook compression tier of the ANN
  * stack (scalar int8 in [[Quantize]] is its 1-dim-subspace degenerate
  * form): the D-dim vector splits into `m` contiguous subspaces of D/m
  * dims, each subspace gets its own k-centroid codebook (Lloyd, seeded
  * deterministically), and a vector encodes as `m` small ints — m bytes
  * at k ≤ 256 against 4·D float bytes (32× here at D=64, m=8).
  *
  * Distances are exact integer arithmetic throughout: sub-distance
  * ‖x−c‖² expands to dotScaled(x,x) − 2·dotScaled(x,c) + dotScaled(c,c),
  * three scaled-integer dots, so assignment is deterministic on any
  * cluster layout (centroid TRAINING uses float means and may drift in
  * the last bits — that moves recall, never correctness, same trade as
  * [[Ivf]]).
  *
  * Query scoring is ADC (asymmetric distance computation): the query
  * keeps its exact subvectors and scores a candidate as the sum of its
  * per-subspace dots with the candidate's CODEBOOK centroids — at scale
  * the per-query (m × k) dot table is precomputed once and candidate
  * scoring is m table lookups per vector, never a float loop over D.
  */
object Pq {

  /** codebooks as a small broadcastable table: (sub, cid, cvec). */
  final case class Codebooks(m: Int, subDim: Int, cents: Seq[(Int, Int, Seq[Float])])

  private def centTable(spark: org.apache.spark.sql.SparkSession,
      cb: Codebooks): DataFrame = {
    import spark.implicits._
    cb.cents.toDF("sub", "cid", "cvec")
  }

  /** One subspace's codebook as a single-subspace
    * [[graft.functions.PqAssignCodes]] argmin over a `subDim`-sized
    * vector column — the native generated loop (an HOF fold or a
    * least-over-structs chain both measured slower; guide §4). Winner
    * semantics are the legacy `min_by(cid, struct(d2, cid))`: exact
    * integer sub-distance, ties to the smaller cid (the expression
    * drops the constant `dot(svec, svec)` term — order unchanged — and
    * precomputes entry self-dots with the identical IEEE chain). */
  private def argminCid(sv: org.apache.spark.sql.Column, subDim: Int,
      entries: Seq[(Int, Int, Seq[Float])]): org.apache.spark.sql.Column = {
    val sorted = entries.sortBy(_._2)
    element_at(org.apache.spark.sql.GraftShims.column(
      graft.functions.PqAssignCodes(
        org.apache.spark.sql.GraftShims.expression(sv), subDim,
        Seq(sorted.map(_._2)),
        Seq(sorted.map(_._3.map(_.toDouble))))), 1)
  }

  /** (vec_id, sub, svec): the m contiguous sub-slices of each vector. */
  def subvectors(emb: DataFrame, m: Int, subDim: Int): DataFrame =
    emb.select(col("vec_id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"),
          slice(col("embedding"), s * subDim + 1, subDim).as("svec"))): _*)).as("x"))
      .select(col("vec_id"), col("x.sub"), col("x.svec"))

  /** (vec_id, sub, cid): nearest codebook centroid per subspace, by the
    * exact integer sub-distance, ties to the lower cid.
    *
    * MAP-ONLY for foldable codebooks (guide §2.4): the codebook rides
    * in as one broadcast row ([[cbRow]]) and each exploded (vec_id,
    * sub, svec) row computes its argmin in place — zero exchange, where
    * the old shape broadcast-joined to N·m·k rows and paid a
    * `groupBy(vec_id, sub)` exchange of N·m rows to fold them back.
    * Codebooks past [[IvfPq.MapOnlyCbEntries]] (the degenerate
    * corpus-sized exact-PQ shape at extreme k) keep the legacy
    * distributed join + `min_by` path. */
  def assign(subs: DataFrame, cb: Codebooks): DataFrame =
    if (cb.cents.size <= IvfPq.MapOnlyCbEntries)
      assignCarry(subs, cb).select(col("vec_id"), col("sub"), col("cid"))
    else
      subs.join(broadcast(centTable(subs.sparkSession, cb)), "sub")
        .withColumn("d2",
          dotScaled(col("svec"), col("svec")) - lit(2L) * dotScaled(col("svec"), col("cvec"))
            + dotScaled(col("cvec"), col("cvec")))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))

  /** [[assign]] with `svec` carried through — (vec_id, sub, svec, cid).
    * Map-only when the codebook inlines: the per-row `sub` selects its
    * subspace's literal chain through a lazily-evaluated CASE branch
    * (only the matching branch's dots run). The legacy path re-joins
    * `subs` (the shape every caller previously paid unconditionally). */
  private def assignCarry(subs: DataFrame, cb: Codebooks): DataFrame =
    if (cb.cents.size <= IvfPq.MapOnlyCbEntries) {
      val bySub = cb.cents.groupBy(_._1).toSeq.sortBy(_._1)
      val cid = bySub.tail.foldLeft(
        when(col("sub") === bySub.head._1,
          argminCid(col("svec"), cb.subDim, bySub.head._2))) {
        case (acc, (sI, entries)) =>
          acc.when(col("sub") === sI, argminCid(col("svec"), cb.subDim, entries))
      }
      subs.withColumn("cid", cid)
    } else assign(subs, cb).join(subs, Seq("vec_id", "sub"))

  /** Train per-subspace codebooks: seed sub-codebook j from the j-th
    * vector (by vec_id — deterministic), then Lloyd iterations over ALL
    * subspaces in one distributed assign + one mean job per round. */
  def train(emb: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 2): Codebooks = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val seeds = Ivf.seedPrefix(emb, k).orderBy(col("vec_id")).limit(k)
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").toSeq)
    var cb = Codebooks(m, subDim, for {
      s <- 0 until m
      (v, j) <- seeds.zipWithIndex
    } yield (s, j, v.slice(s * subDim, (s + 1) * subDim)))
    val subs = subvectors(emb, m, subDim).localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val means = assignCarry(subs, cb)
        .select(col("sub"), col("cid"), posexplode(col("svec")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(avg(col("col").cast("double")).as("mean"))
        .collect()
        .groupBy(r => (r.getAs[Int]("sub"), r.getAs[Int]("cid")))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("mean").toFloat).toSeq
        }
      // a centroid that lost every member keeps its previous position
      cb = cb.copy(cents = cb.cents.map { case (s, c, old) =>
        (s, c, means.getOrElse((s, c), old)) })
    }
    cb
  }

  /** (vec_id, codes): each vector as m codebook ids in subspace order.
    * Map-only for foldable codebooks: all m argmins compute on the
    * un-exploded row, so the former Generate → join → two-exchange
    * re-assembly (`groupBy(vec_id, sub)` then `groupBy(vec_id)`
    * collect_list) is a single project. */
  def encode(emb: DataFrame, cb: Codebooks): DataFrame =
    if (cb.cents.size <= IvfPq.MapOnlyCbEntries) {
      val bySub = cb.cents.groupBy(_._1)
      val ordered = (0 until cb.m).map(sI => bySub(sI).sortBy(_._2))
      emb.select(col("vec_id"), org.apache.spark.sql.GraftShims.column(
        graft.functions.PqAssignCodes(
          org.apache.spark.sql.GraftShims.expression(col("embedding")),
          cb.subDim,
          ordered.map(_.map(_._2)),
          ordered.map(_.map(_._3.map(_.toDouble))))).as("codes"))
    }
    else
      assign(subvectors(emb, cb.m, cb.subDim), cb)
        .groupBy(col("vec_id"))
        .agg(array_sort(collect_list(struct(col("sub"), col("cid")))).as("sc"))
        .select(col("vec_id"), expr("transform(sc, x -> x.cid)").as("codes"))

  /** ADC top-k: exact query subvectors against candidate CODES.
    * Returns (query_id, rnk, neighbor_id).
    *
    * For dense foldable codebooks (cids 0..k-1 per subspace — exactly
    * [[train]]'s construction) the candidate stream is ONE row per
    * (query, neighbor): codes ride as [[encode]]'s array, the per-query
    * m·k LUT rides the broadcast query row as one array column, and
    * each row computes its complete score as m `element_at` adds —
    * exact long addition, bit-identical to the former per-sub
    * `sum(d)` fold, which pushed m× the rows through the join AND paid
    * a (query_id, neighbor_id) re-fold exchange (guide §2.3/§2.4).
    * Non-dense or oversized codebooks (the degenerate exact-PQ gate)
    * keep the relational (query, sub, cid) LUT join. */
  def topKAdc(emb: DataFrame, queries: DataFrame, k: Int, cb: Codebooks): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val bySub = cb.cents.groupBy(_._1)
    val dense = cb.cents.size <= IvfPq.MapOnlyCbEntries &&
      bySub.keySet == (0 until cb.m).toSet && {
        val ordered = (0 until cb.m).map(sI => bySub(sI).sortBy(_._2))
        val kk = ordered.head.size
        ordered.forall(es => es.size == kk && es.map(_._2) == (0 until kk))
      }
    val scored =
      if (dense) {
        val ordered = (0 until cb.m).map(sI => bySub(sI).sortBy(_._2))
        val kk = ordered.head.size
        val codes = encode(emb, cb)
          .select(col("vec_id").as("neighbor_id"), col("codes"))
        val qlut = queries.select(col("vec_id").as("query_id"),
          array(ordered.zipWithIndex.flatMap { case (es, sI) =>
            val qs = slice(col("embedding"), sI * cb.subDim + 1, cb.subDim)
            es.map(e => dotScaled(qs, array(e._3.map(lit): _*)))
          }: _*).as("_lut"))
        codes.join(broadcast(qlut), col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            (0 until cb.m).map(sI => element_at(col("_lut"),
              lit(sI * kk + 1) + element_at(col("codes"), sI + 1)))
              .reduce(_ + _).as("score"))
      } else {
        val codes = assign(subvectors(emb, cb.m, cb.subDim), cb)
          .select(col("vec_id").as("neighbor_id"), col("sub"), col("cid"))
        val qsubs = subvectors(queries, cb.m, cb.subDim)
          .select(col("vec_id").as("query_id"), col("sub"), col("svec"))
        // the per-query lookup table: m*k scaled dots per query
        val lut = qsubs.join(broadcast(centTable(spark, cb)), "sub")
          .select(col("query_id"), col("sub"), col("cid"),
            dotScaled(col("svec"), col("cvec")).as("d"))
        codes.join(broadcast(lut), Seq("sub", "cid"))
          .filter(col("neighbor_id") =!= col("query_id"))
          .groupBy(col("query_id"), col("neighbor_id"))
          .agg(sum(col("d")).as("score"))
      }
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"))
  }

  /** The production PQ shape: ADC prunes the corpus to a `shortlist`
    * per query, exact scaled-integer cosine re-ranks only the
    * shortlist. Degenerate-exact configuration (the gate): a codebook
    * with `k = |corpus|` seeds and zero Lloyd iterations makes every
    * subvector its own centroid — reconstruction is exact, the ADC
    * score equals the exact dot bit-for-bit (same per-element floors,
    * integer addition regroups freely) — and a shortlist ≥ |corpus|
    * passes everything through, so the result equals brute force and
    * sits under the same hash oracle as `q_cosine_topk`. */
  def topKRerank(emb: DataFrame, queries: DataFrame, k: Int,
      cb: Codebooks, shortlist: Int): DataFrame =
    Similarity.rerankExact(
      topKAdc(emb, queries, shortlist, cb)
        .select(col("query_id"), col("neighbor_id")),
      emb, queries, Similarity.norms(emb), k)
}
