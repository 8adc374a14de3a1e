package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Similarity.{dotScaled, norms}

/** IVF-PQ — the composed production ANN index (the FAISS `IVFx,PQy`
  * shape): a coarse quantizer routes each vector to one of `nLists`
  * inverted lists ([[Ivf]]), and the vector's RESIDUAL against its list
  * centroid is product-quantized to `m` codes ([[Pq]]'s subspace
  * machinery over residuals, codebooks shared across lists — the
  * standard simplification). A query then (1) picks its `nProbe`
  * nearest lists by exact integer dot, (2) ADC-scores every candidate
  * in those lists as `dot(q, c_list) + Σ_sub dot(q_sub, r̂_sub)` — m
  * lookup-table adds per candidate, never a float loop over D — and
  * (3) exact-re-ranks only the top-`shortlist`. At 100 TB this is the
  * memory-bound layout: m bytes per vector in the hot path (32× under
  * 4·D float bytes at D=64, m=8) and |probed|/|lists| of the corpus
  * scanned per query.
  *
  * Determinism: residuals are computed in DOUBLE — the difference of
  * two floats is exactly representable in a double (≤ 49 significand
  * bits), so `cast(x as double) - cast(c as double)` is bit-identical
  * in any engine, where float subtraction vs double-promoted
  * subtraction would drift in the last bit. Every distance/score is the
  * scaled-integer dot; ties break on (d2, code) / (score, neighbor_id)
  * total orders. With both quantizers pinned (iters = 0: coarse = first
  * nLists vectors, residual codebooks = first k residual slices) the
  * whole index build + probe replays in SQL — the `q_cosine_ivfpq`
  * oracle does exactly that. Lloyd-trained quantizers move recall,
  * never correctness (the exact re-rank is unaffected).
  */
object IvfPq {

  /** A built index: coarse centroids, residual codebooks (sub, code,
    * rvec — DOUBLE), the per-vector codes, and the corpus norms for the
    * exact re-rank. `codes`/`n2` are checkpointed: built once, probed
    * many times.
    *
    * CODES LAYOUT (r21, guide §2.3 — shuffle fewer bytes): ONE row per
    * vector with the m sub-codes as an array column, not m rows per
    * vector. The ADC candidate stream (|probed lists| × |queries| rows
    * after the probe join — the engine's biggest exchange in the
    * self-join shape) therefore carries 1/m of the former row count,
    * and the (query_id, neighbor_id) re-fold aggregation disappears
    * outright: with the per-query LUT carried on the probe row, each
    * candidate row computes its COMPLETE ADC score in place. */
  final case class Index(
      cents: Seq[(Int, Seq[Float])],
      cb: Seq[(Int, Int, Seq[Double])],
      m: Int, subDim: Int,
      codes: DataFrame, // (neighbor_id, cid, codes: array<int> of m)
      n2: DataFrame)    // (vec_id, n2)

  private def coarseDf(s: SparkSession, cents: Seq[(Int, Seq[Float])]): DataFrame = {
    import s.implicits._
    cents.toDF("cid", "cvec")
  }

  private def cbDf(s: SparkSession, cb: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    import s.implicits._
    cb.toDF("sub", "code", "rvec")
  }

  /** (vec_id, cid, res): each vector's double-exact residual against its
    * assigned coarse centroid. MAP-ONLY: the native
    * [[graft.functions.NearestCentroidResidual]] computes the argmax
    * and the residual subtraction in one generated pass per row — the
    * former assign → re-join(emb) → re-join(cents) chain shuffled the
    * corpus twice to recover columns the assignment already held
    * (guide §2.4), and its replacement `zip_with` would have run
    * interpreted (guide §4). */
  def residuals(emb: DataFrame, cents: Seq[(Int, Seq[Float])]): DataFrame =
    if (cents.size <= MapOnlyCbEntries) {
      val sorted = cents.sortBy(_._1)
      emb.select(col("vec_id"), org.apache.spark.sql.GraftShims.column(
          graft.functions.NearestCentroidResidual(
            org.apache.spark.sql.GraftShims.expression(col("embedding")),
            sorted.map(_._1), sorted.map(_._2.map(_.toDouble)))).as("_cr"))
        .select(col("vec_id"), col("_cr.cid").as("cid"),
          col("_cr.res").as("res"))
    } else
      Ivf.assign(emb, cents)
        .join(emb, "vec_id")
        .join(broadcast(coarseDf(emb.sparkSession, cents)), "cid")
        .select(col("vec_id"), col("cid"),
          zip_with(col("embedding"), col("cvec"),
            (x, c) => x.cast("double") - c.cast("double")).as("res"))

  private def subSlices(df: DataFrame, vecCol: String, m: Int, subDim: Int,
      out: String): DataFrame =
    df.withColumn("_x", explode(array((0 until m).map(sI =>
        struct(lit(sI).as("sub"),
          slice(col(vecCol), sI * subDim + 1, subDim).as(out))): _*)))
      .drop(vecCol)
      .withColumn("sub", col("_x.sub"))
      .withColumn(out, col("_x." + out))
      .drop("_x")

  /** Map-only vs broadcast-join dispatch bound for quantizer argmins:
    * up to this many codebook/centroid entries the assignment inlines as
    * a LITERAL `greatest`/`least` chain — fully whole-stage-codegen,
    * zero exchange; past it the literal expression tree stops being
    * reasonable (and a degenerate corpus-sized codebook must never
    * inline), so the legacy distributed broadcast-join + `min_by`/
    * `max_by` path keeps per-row work bounded. The engine's production
    * configurations are far below it (IVF nLists = 16, PQ/IVF-PQ
    * m·k = 128); the deliberate exception above it is
    * `q_cosine_pq_exact`'s corpus-sized codebook (m·k = 1600), which
    * keeps the distributed path by design. */
  private[ext] val MapOnlyCbEntries = 512

  /** (vec_id, cid, codes): ALL m nearest residual-codebook entries as
    * one array column in subspace order — the exact integer
    * sub-distance argmin per subspace, ties to the lower code, one row
    * per vector (guide §2.3: the array layout carries 1/m of the
    * per-sub-row layout's row count through every downstream join and
    * exchange).
    *
    * MAP-ONLY (guide §2.4, §4): all m argmins run as the native
    * [[graft.functions.PqAssignCodes]] expression — one generated loop
    * per row over plan-time codebook state, zero exchange — where the
    * old shape paid a Generate to N·m rows, a broadcast join to N·m·k,
    * and a `groupBy(vec_id, cid, sub)` exchange of N·m rows. Two exact
    * simplifications inside the kernel keep the winner bit-identical:
    * the candidate order drops the `dot(sv, sv)` term (constant across
    * one subspace's candidates, so `(d2, code)` and `(d2 − dot(sv,sv),
    * code)` order identically over exact longs), and each entry's
    * self-dot is precomputed at construction with the identical
    * per-element `floor(x·y·1e15)` chain `dotScaled` generates (IEEE
    * doubles both sides; long addition associative) — ONE dot per
    * candidate instead of three. Codebooks larger than
    * [[MapOnlyCbEntries]] keep the legacy distributed per-sub path and
    * fold it back to the array layout with a deterministic
    * sort-by-sub collect (same winners, same order). */
  def assignCodes(res: DataFrame, cb: Seq[(Int, Int, Seq[Double])],
      m: Int, subDim: Int): DataFrame =
    if (cb.size <= MapOnlyCbEntries)
      res.select(col("vec_id"), col("cid"),
        codesColumn(cb, m, subDim).as("codes"))
    else
      subSlices(res, "res", m, subDim, "svec")
        .join(broadcast(cbDf(res.sparkSession, cb)), "sub")
        .withColumn("d2", dotScaled(col("svec"), col("svec"))
          - lit(2L) * dotScaled(col("svec"), col("rvec"))
          + dotScaled(col("rvec"), col("rvec")))
        .groupBy(col("vec_id"), col("cid"), col("sub"))
        .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))
        .groupBy(col("vec_id"), col("cid"))
        .agg(array_sort(collect_list(struct(col("sub"), col("code"))))
          .as("sc"))
        .select(col("vec_id"), col("cid"),
          expr("transform(sc, x -> x.code)").as("codes"))

  /** The [[graft.functions.PqAssignCodes]] column over a `res` column —
    * shared by [[assignCodes]] and the train loop (which keeps `res` on
    * the row to avoid re-joining the slices). */
  private def codesColumn(cb: Seq[(Int, Int, Seq[Double])], m: Int,
      subDim: Int): org.apache.spark.sql.Column = {
    val bySub = cb.groupBy(_._1)
    val ordered = (0 until m).map(sI => bySub(sI).sortBy(_._2))
    org.apache.spark.sql.GraftShims.column(
      graft.functions.PqAssignCodes(
        org.apache.spark.sql.GraftShims.expression(col("res")), subDim,
        ordered.map(_.map(_._2)), ordered.map(_.map(_._3))))
  }

  /** Build: coarse quantizer ([[Ivf.train]], `itersCoarse` Lloyd
    * rounds), residuals, residual codebooks seeded from the first `k`
    * vectors' residual slices + `itersPq` Lloyd rounds, then one
    * assignment pass materializes the codes. */
  def buildIndex(emb: DataFrame, nLists: Int = 16, m: Int = 8, k: Int = 16,
      itersCoarse: Int = 0, itersPq: Int = 0): Index = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val cents = Ivf.train(emb, nLists, itersCoarse)
    val res = residuals(emb, cents).localCheckpoint(true)
    val seeds = res.orderBy(col("vec_id")).limit(k).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("res").toSeq)
    var cb: Seq[(Int, Int, Seq[Double])] = for {
      sI <- 0 until m
      (v, j) <- seeds.zipWithIndex.toSeq
    } yield (sI, j, v.slice(sI * subDim, (sI + 1) * subDim))
    (1 to itersPq).foreach { _ =>
      // assignment keeps `res` ON the row (map-only), so the mean pass
      // never re-joins the slices it already held — the legacy path
      // re-attaches res for codebooks past the map-only gate only
      val assigned =
        if (cb.size <= MapOnlyCbEntries)
          res.withColumn("_codes", codesColumn(cb, m, subDim))
        else assignCodes(res, cb, m, subDim)
          .withColumnRenamed("codes", "_codes")
          .join(res, Seq("vec_id", "cid"))
      val means = assigned
        .withColumn("_x", explode(array((0 until m).map(sI =>
          struct(lit(sI).as("sub"),
            element_at(col("_codes"), sI + 1).as("code"),
            slice(col("res"), sI * subDim + 1, subDim).as("svec"))): _*)))
        .select(col("_x.sub").as("sub"), col("_x.code").as("code"),
          posexplode(col("_x.svec")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(avg(col("col")).as("mean"))
        .collect()
        .groupBy(r => (r.getAs[Int]("sub"), r.getAs[Int]("code")))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("mean")).toSeq
        }
      // a code that lost every member keeps its previous position
      cb = cb.map { case (sI, c, old) => (sI, c, means.getOrElse((sI, c), old)) }
    }
    val codes = assignCodes(res, cb, m, subDim)
      .withColumnRenamed("vec_id", "neighbor_id")
      .localCheckpoint(true)
    Index(cents, cb, m, subDim, codes, norms(emb).localCheckpoint(true))
  }

  /** The per-query ADC lookup table carried as ONE array column,
    * computed in place from the query embedding: element
    * `sub·k + code + 1` is the exact scaled dot of the query's sub-slice
    * with that code's codebook entry — bit-identical to the relational
    * LUT table's `dotScaled(qs, rvec)` — so the (query_id, sub, code)
    * LUT join collapses to an `element_at` lookup on the row the probe
    * join already produced (guide §2.4: in [[probeShuffled]] that join
    * SORTED the full ADC candidate stream, the plan's largest exchange;
    * in [[probe]] it was a per-candidate broadcast hash probe). Only
    * valid for dense per-sub codes (0..k-1, uniform k — exactly
    * [[buildIndex]]'s construction); [[lutEntries]] returns None
    * otherwise and callers keep the relational join. */
  private def lutEntries(cb: Seq[(Int, Int, Seq[Double])],
      m: Int): Option[Seq[Seq[Seq[Double]]]] = {
    if (cb.size > MapOnlyCbEntries) return None
    val bySub = cb.groupBy(_._1)
    if (bySub.keySet != (0 until m).toSet) return None
    val ordered = (0 until m).map(sI => bySub(sI).sortBy(_._2))
    val k = ordered.head.size
    if (ordered.forall(es => es.size == k && es.map(_._2) == (0 until k)))
      Some(ordered.map(_.map(_._3)))
    else None
  }

  private def lutArray(qe: org.apache.spark.sql.Column, subDim: Int,
      entries: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.Column =
    array(entries.zipWithIndex.flatMap { case (es, sI) =>
      val qs = slice(qe, sI * subDim + 1, subDim)
      es.map(rv => dotScaled(qs, array(rv.map(lit): _*)))
    }: _*)

  /** The complete per-candidate ADC sum `Σ_s lut[s·k + codes[s]]` over
    * the row's `codes` array and the probe row's carried `_lut` — m
    * element_at lookups, whole-stage codegen, exact long addition (any
    * grouping gives the identical value, so this equals the former
    * m-row `sum(d)` aggregate bit-for-bit). */
  private def adcSum(k: Int, m: Int): org.apache.spark.sql.Column =
    (0 until m).map(sI => element_at(col("_lut"),
      lit(sI * k + 1) + element_at(col("codes"), sI + 1))).reduce(_ + _)

  /** Probe: nProbe nearest lists by exact integer dot, ADC prune to
    * `shortlist`, exact scaled-integer cosine re-rank to top `k`
    * ([[Similarity.rerankExact]] — joins `emb` for the shortlisted
    * candidates only; queries must be in the indexed corpus).
    * Returns (query_id, rnk, neighbor_id, cos_sim). */
  def probe(emb: DataFrame, index: Index, queries: DataFrame, k: Int,
      nProbe: Int, shortlist: Int): DataFrame = {
    val s = queries.sparkSession
    val q0 = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cdot").desc, col("cid").asc)
    val lutE = lutEntries(index.cb, index.m)
    val probes0 = q0
      .crossJoin(broadcast(coarseDf(s, index.cents)))
      .withColumn("cdot", dotScaled(col("qe"), col("cvec")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
    val probes = lutE match {
      case Some(es) => probes0.select(col("query_id"), col("cid"),
        col("cdot"), lutArray(col("qe"), index.subDim, es).as("_lut"))
      case None => probes0.select(col("query_id"), col("cid"), col("cdot"))
    }
    // probes is bounded by the query batch (|queries| x nProbe rows):
    // broadcast it into the corpus-sized codes table — a shuffle join
    // on the 16-value cid key would funnel the corpus through nLists
    // partitions at scale
    val tkl = udaf(new Similarity.TopKLongAgg(shortlist),
      org.apache.spark.sql.Encoders.product[Similarity.ScoredL])
    val scored0 = index.codes.join(broadcast(probes), "cid")
      .filter(col("neighbor_id") =!= col("query_id"))
    val cand = (lutE match {
      case Some(es) =>
        // one candidate ROW per (query, neighbor) — codes ride as an
        // array, the LUT rides on the probe row, so the row computes
        // its COMPLETE score in place and the former m-row
        // (query_id, neighbor_id) re-fold exchange is gone
        scored0.select(col("query_id"), col("neighbor_id"),
          (col("cdot") + adcSum(es.head.size, index.m)).as("score"))
      case None =>
        // non-dense codebook fallback: the relational per-query LUT
        // over the exploded codes, folded back per (query, neighbor)
        val lut = subSlices(q0, "qe", index.m, index.subDim, "qs")
          .join(broadcast(cbDf(s, index.cb)), "sub")
          .select(col("query_id"), col("sub"), col("code"),
            dotScaled(col("qs"), col("rvec")).as("d"))
        scored0.select(col("query_id"), col("neighbor_id"), col("cdot"),
            posexplode(col("codes")).as(Seq("sub", "code")))
          .join(broadcast(lut), Seq("query_id", "sub", "code"))
          .groupBy(col("query_id"), col("neighbor_id"))
          // cdot is constant per (query, cid) and a neighbor lives in
          // ONE list: max() just carries it through the m-row group
          .agg((max(col("cdot")) + sum(col("d"))).as("score"))
    })
      // bounded-heap shortlist selection (score desc, neighbor_id asc):
      // partial-aggregates map-side, so only `shortlist` rows per
      // (partition, query) reach the exchange — a row_number window here
      // would funnel every ADC-scored candidate of a hot query through
      // ONE partition and fully sort it
      .groupBy(col("query_id"))
      .agg(tkl(col("neighbor_id"), col("score")).as("top"))
      .select(col("query_id"), explode(col("top.items")).as("x"))
      .select(col("query_id"), col("x.cid").as("neighbor_id"))
    Similarity.rerankExact(cand, emb, queries, index.n2, k)
  }

  /** [[probe]] for UNBOUNDED query sets — the ANN-self-join /
    * dedup-by-ANN shape where queries ≈ corpus and nothing query-sized
    * may broadcast. Identical values to [[probe]] (every score is the
    * same deterministic integer math; only physical strategy changes):
    *
    *   - codes ⋈ probes becomes a SALTED shuffle join: `cid` has only
    *     `nLists` values, so a plain shuffle join would funnel the whole
    *     corpus through nLists partitions. The codes side keys on
    *     (cid, pmod(neighbor_id, salts)); the probe side explodes each
    *     row into `salts` copies — nLists·salts effective keys, corpus
    *     rows never replicate (only the |Q|·nProbe probe rows do).
    *   - the per-query ADC LUT rides the probe rows as one m·k-long
    *     array column ([[lutArray]]) and each candidate's `d` is an
    *     `element_at` lookup — the former relational LUT join sorted
    *     the FULL ADC candidate stream on (query_id, sub, code).
    *   - the exact re-rank shuffle-joins the query embeddings
    *     ([[Similarity.rerankExact]] with broadcastQueries = false).
    *
    * The only broadcasts left are the two index-geometry tables
    * (centroids: nLists rows; codebooks: m·k rows) — both O(index
    * config), independent of corpus and query-set size. */
  def probeShuffled(emb: DataFrame, index: Index, queries: DataFrame,
      k: Int, nProbe: Int, shortlist: Int, salts: Int = 8): DataFrame = {
    val s = queries.sparkSession
    val q0 = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cdot").desc, col("cid").asc)
    val lutE = lutEntries(index.cb, index.m)
    val probes0 = q0
      .crossJoin(broadcast(coarseDf(s, index.cents)))
      .withColumn("cdot", dotScaled(col("qe"), col("cvec")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
    val probes = (lutE match {
      case Some(es) => probes0.select(col("query_id"), col("cid"),
        col("cdot"), lutArray(col("qe"), index.subDim, es).as("_lut"))
      case None => probes0.select(col("query_id"), col("cid"), col("cdot"))
    }).withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    val tkl = udaf(new Similarity.TopKLongAgg(shortlist),
      org.apache.spark.sql.Encoders.product[Similarity.ScoredL])
    val scored0 = index.codes
      .withColumn("salt", pmod(col("neighbor_id"), lit(salts)).cast("int"))
      .join(probes, Seq("cid", "salt"))
      .filter(col("neighbor_id") =!= col("query_id"))
    val cand = (lutE match {
      // the carried-LUT lookup over the codes ARRAY: one candidate row
      // per (query, neighbor) computes its complete score in place —
      // the former per-sub layout pushed m× these rows through the
      // salted join AND paid a (query_id, neighbor_id) re-fold
      // exchange of the full candidate stream (guide §2.3/§2.4)
      case Some(es) =>
        scored0.select(col("query_id"), col("neighbor_id"),
          (col("cdot") + adcSum(es.head.size, index.m)).as("score"))
      case None =>
        val lut = subSlices(q0, "qe", index.m, index.subDim, "qs")
          .join(broadcast(cbDf(s, index.cb)), "sub")
          .select(col("query_id"), col("sub"), col("code"),
            dotScaled(col("qs"), col("rvec")).as("d"))
        scored0.select(col("query_id"), col("neighbor_id"), col("cdot"),
            posexplode(col("codes")).as(Seq("sub", "code")))
          .join(lut, Seq("query_id", "sub", "code"))
          .groupBy(col("query_id"), col("neighbor_id"))
          .agg((max(col("cdot")) + sum(col("d"))).as("score"))
    })
      .groupBy(col("query_id"))
      .agg(tkl(col("neighbor_id"), col("score")).as("top"))
      .select(col("query_id"), explode(col("top.items")).as("x"))
      .select(col("query_id"), col("x.cid").as("neighbor_id"))
    Similarity.rerankExact(cand, emb, queries, index.n2, k,
      broadcastQueries = false)
  }

  /** Persist a built index: quantizers + codes + norms under one root —
    * the production handoff (build once on the corpus pass, probe from
    * any later job). Geometry (m, subDim) is recovered from the
    * codebook table itself, so there is no side metadata file to drift
    * out of sync.
    *
    * The four parts are [[graft.land.AtomicLanding]] tables, and the
    * whole QUADRUPLE publishes atomically through one
    * [[graft.land.AtomicLanding.publishLinked]] root generation (the
    * engine-wide linked-table primitive — the BM25 and plain-IVF
    * persisted indexes share it): each part commits first (its
    * returned version is its generation id), then the root manifest
    * pinning all four versions swings last — O(metadata), no fifth
    * Spark write. A re-save (the retrain-on-drift path) therefore
    * flips readers from one complete index to the next in one step — a
    * [[load]] racing it resolves either four OLD parts or four NEW
    * parts, never a cents-from-one-generation / codes-from-another
    * mix, which a per-part `mode(overwrite)` layout could serve — and
    * the CAS on the prior root generation makes two racing re-saves
    * fail loudly instead of interleaving. A crash anywhere before the
    * root swing publishes NOTHING (the staged part generations are
    * invisible garbage [[maintainSavedIndex]] reclaims).
    * `beforePublish` is the root swing's test seam. */
  def save(index: Index, path: String,
      beforePublish: () => Unit = () => (),
      beforeMember: String => Unit = _ => (),
      batchId: Option[Long] = None): Unit = {
    val s = index.codes.sparkSession
    import graft.land.AtomicLanding
    beforeMember("cents")
    val centsV = AtomicLanding.commit(
      coarseDf(s, index.cents).coalesce(1), s"$path/cents")
    beforeMember("cb")
    val cbV = AtomicLanding.commit(
      cbDf(s, index.cb).coalesce(1), s"$path/cb")
    // batchId = seed watermark on BOTH growable members (codes and n2
    // carry independent watermarks — Ivf.buildSavedIndex's contract):
    // vouch the build corpus so the first identified append skips the
    // per-member dedupe scan
    beforeMember("codes")
    val codesV = AtomicLanding.commit(index.codes, s"$path/codes",
      batchId = batchId)
    beforeMember("n2")
    val n2V = AtomicLanding.commit(index.n2, s"$path/n2",
      batchId = batchId)
    AtomicLanding.publishLinked(path,
      Map("cents" -> centsV, "cb" -> cbV, "codes" -> codesV, "n2" -> n2V),
      expectedRoot = AtomicLanding.currentRootVersion(path),
      beforePublish = beforePublish)
    ()
  }

  /** Load an index saved by [[save]]: resolve the root row once, then
    * read every part AT ITS PINNED VERSION — the consistent quadruple
    * that row published, regardless of any re-save landing
    * concurrently. The codes/norms load as lazy snapshot-isolated
    * scans, so the ADC prune runs off the saved compressed layout
    * alone; [[probe]]'s final EXACT re-rank still joins the corpus
    * embeddings for the shortlisted candidates (that is the re-rank's
    * definition — skip it only if ADC order suffices), and queries
    * must be part of the indexed corpus (the norm join drops unknown
    * query ids). */
  def load(s: SparkSession, path: String): Index = {
    import graft.land.AtomicLanding
    val snap = AtomicLanding.linkedSnapshot(path).getOrElse(
      throw new IllegalStateException(s"no saved IVF-PQ index at $path"))
    val cents = AtomicLanding
      .readVersion(s, s"$path/cents", snap.members("cents"))
      .orderBy("cid").collect()
      .map(r => (r.getAs[Int]("cid"),
        r.getAs[scala.collection.Seq[Float]]("cvec").toSeq)).toSeq
    val cb = AtomicLanding.readVersion(s, s"$path/cb", snap.members("cb"))
      .orderBy("sub", "code").collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code"),
        r.getAs[scala.collection.Seq[Double]]("rvec").toSeq)).toSeq
    Index(cents, cb, cb.map(_._1).max + 1, cb.head._3.size,
      AtomicLanding.readVersion(s, s"$path/codes", snap.members("codes")),
      AtomicLanding.readVersion(s, s"$path/n2", snap.members("n2")))
  }

  /** Index MAINTENANCE: append a batch of vectors to a [[save]]d index
    * WITHOUT retraining — [[Ivf.addToSavedIndex]]'s semantics on the
    * compressed tier, completing the engine-wide contract (every
    * persisted index grows; IVF-PQ previously required a full
    * re-save). The FROZEN coarse quantizer and codebooks load once at
    * their root-pinned versions (bounded: nLists×dim + m×k×subDim
    * rows); the batch pays one residual + code-assignment job that
    * scales with the batch, and the codes and norms tables append
    * through ACID commits before one root CAS publishes the new
    * quadruple with cents/cb pinned unchanged — a probe never scores
    * codes from one generation under another generation's codebooks.
    *
    * TWO-MEMBER EXACTNESS: codes and n2 are separate tables, so a
    * crash can land between their commits. Each member therefore
    * carries its own dedupe — the batch-id check (`batchId` recorded
    * in EACH member's manifest, atomic with its data) or, id-less,
    * an anti-join against that member's own live rows — so a retry
    * completes exactly the missing member and never duplicates the
    * committed one. Until the root swings, any committed half is
    * unreachable staging; probes keep the previous quadruple.
    *
    * With deterministic quantizers (iters = 0) the grown index is
    * bit-identical to a one-shot [[buildIndex]]+[[save]] over the
    * union corpus — `q_cosine_ivfpq_grown` reuses the saved-probe
    * replay oracle unchanged on that equality. Vec ids are
    * immutable-by-contract, as everywhere in the engine. */
  def addToSavedIndex(s: SparkSession, path: String, batch: DataFrame,
      batchId: Option[Long] = None,
      beforePublish: () => Unit = () => (),
      beforeRootPublish: () => Unit = () => (),
      writer: String = ""): Unit = {
    import graft.land.AtomicLanding
    val codesT = s"$path/codes"
    val n2T = s"$path/n2"
    def committed(t: String): Boolean =
      batchId.exists(b => AtomicLanding.lastBatchId(t, writer).exists(_ >= b))
    // a member whose LIVE version is a committed-but-unpublished
    // REWRITE (dir lineage disjoint from the pin — a [[save]] re-save
    // that crashed before its root swing), as opposed to an append
    // chain a crashed addToSavedIndex leaves (dirs superset)
    def rewriteAhead(t: String, pin: Long): Boolean = {
      val live = AtomicLanding.currentVersion(t).get
      live != pin && !AtomicLanding.dirsOfVersion(t, pin).toSet
        .subsetOf(AtomicLanding.dirsOfVersion(t, live).toSet)
    }
    var done = false
    while (!done) {
      val snap = AtomicLanding.linkedSnapshot(path).getOrElse(
        throw new IllegalStateException(s"no saved IVF-PQ index at $path"))
      // CRASHED RE-SAVE detection BEFORE any append work: appending
      // old-quantizer codes on top of a re-save's rewritten tables
      // would make the next publish serve a mixed generation. save()
      // commits cents -> cb -> codes -> n2 -> root, so n2-ahead means
      // the quadruple is COMPLETE (heal it forward and append against
      // the new quantizers); codes-ahead without n2 is INCOMPLETE and
      // cannot be completed here (the re-save's source corpus is not
      // ours to re-derive) — refuse loudly, re-running save() heals.
      if (rewriteAhead(codesT, snap.members("codes")) ||
          rewriteAhead(n2T, snap.members("n2"))) {
        if (rewriteAhead(n2T, snap.members("n2"))) {
          try {
            AtomicLanding.publishLinked(path, Map(
              "cents" -> AtomicLanding.currentVersion(s"$path/cents").get,
              "cb" -> AtomicLanding.currentVersion(s"$path/cb").get,
              "codes" -> AtomicLanding.currentVersion(codesT).get,
              "n2" -> AtomicLanding.currentVersion(n2T).get),
              expectedRoot = Some(snap.rootVersion))
          } catch {
            case _: java.util.ConcurrentModificationException => ()
          }
        } else throw new IllegalStateException(
          s"$path: a crashed re-save left an incomplete member rewrite " +
            "(codes ahead of the root pin, n2 not) — re-run save() over " +
            "the intended index to heal before appending")
      } else {
      def freshFor(t: String, keyCol: String): DataFrame =
        if (batchId.isDefined &&
            AtomicLanding.lastBatchId(t, writer).isDefined) {
          // identified: monotone ids mean a batch below the recorded id
          // is fully in THIS member, one above it not at all — no scan.
          // Only sound when the member HAS a watermark: after id-less
          // growth the first identified append pays the scan once
          if (committed(t)) batch.limit(0) else batch
        } else {
          dedupeCodeScans.incrementAndGet()
          batch.join(
            AtomicLanding.read(s, t).select(col(keyCol).as("vec_id")).distinct(),
            Seq("vec_id"), "left_anti")
        }
      val freshN2 = freshFor(n2T, "vec_id").persist()
      val freshCodes = freshFor(codesT, "neighbor_id").persist()
      try {
        // an identified batch with an empty fallback delta still
        // records its id per member (O(metadata) empty append), making
        // the watermark durable for the zero-scan fast path
        val nNew =
          if (!freshN2.isEmpty || (batchId.isDefined && !committed(n2T)))
            AtomicLanding.commit(norms(freshN2), n2T, append = true,
              batchId = batchId, writer = writer)
          else AtomicLanding.currentVersion(n2T).get
        val cNew =
          if (!freshCodes.isEmpty ||
              (batchId.isDefined && !committed(codesT))) {
            val cents = AtomicLanding
              .readVersion(s, s"$path/cents", snap.members("cents"))
              .orderBy("cid").collect()
              .map(r => (r.getAs[Int]("cid"),
                r.getAs[scala.collection.Seq[Float]]("cvec").toSeq)).toSeq
            val cb = AtomicLanding
              .readVersion(s, s"$path/cb", snap.members("cb"))
              .orderBy("sub", "code").collect()
              .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code"),
                r.getAs[scala.collection.Seq[Double]]("rvec").toSeq)).toSeq
            AtomicLanding.commit(
              assignCodes(residuals(freshCodes, cents), cb,
                  cb.map(_._1).max + 1, cb.head._3.size)
                .withColumnRenamed("vec_id", "neighbor_id"),
              codesT, append = true, beforePublish = beforePublish,
              batchId = batchId, writer = writer)
          } else AtomicLanding.currentVersion(codesT).get
        if (cNew == snap.members("codes") && nNew == snap.members("n2"))
          done = true // true replay no-op
        else {
          try {
            AtomicLanding.publishLinked(path, Map(
              "cents" -> snap.members("cents"), "cb" -> snap.members("cb"),
              "codes" -> cNew, "n2" -> nNew),
              expectedRoot = Some(snap.rootVersion),
              beforePublish = beforeRootPublish)
            done = true
          } catch {
            case _: java.util.ConcurrentModificationException => ()
          }
        }
      } finally { freshN2.unpersist(); freshCodes.unpersist() }
      }
    }
  }

  /** O(index) dedupe scans taken by id-less [[addToSavedIndex]]
    * appends (counted per member side) — the proof seam that an
    * identified batch never pays the live-table anti-joins. */
  private[ext] val dedupeCodeScans =
    new java.util.concurrent.atomic.AtomicLong

  /** Rebuild attempts [[rebalanceSavedIndex]] lost to a concurrent
    * commit (member-CAS or root-CAS) — the proof seam that a racing
    * append makes the rebalance RETRY over the fresh state rather
    * than silently overwrite it. */
  private[ext] val rebalanceRetries =
    new java.util.concurrent.atomic.AtomicLong

  /** Rebuilds [[rebalanceSavedIndex]] SKIPPED because the drift probe
    * proved retraining would reproduce the live quantizers — the proof
    * seam that a no-drift rebalance never pays the corpus-sized
    * recode. */
  private[graft] val rebalanceSkips =
    new java.util.concurrent.atomic.AtomicLong

  /** Position-matched quantizer-table comparison for the drift probe:
    * every new centroid within `tol` × its old counterpart's norm
    * (tol = 0 demands bit-stable equality — which deterministic
    * iters = 0 training delivers, since both tables are arithmetic on
    * the same corpus prefix read from the same parquet). */
  private[ext] def withinDrift(old: Seq[Seq[Double]], nu: Seq[Seq[Double]],
      tol: Double): Boolean =
    old.size == nu.size && old.zip(nu).forall { case (o, n) =>
      o.size == n.size && {
        val d = math.sqrt(o.zip(n).map { case (x, y) =>
          (x - y) * (x - y) }.sum)
        d == 0.0 || d <= tol * math.max(
          math.sqrt(o.map(x => x * x).sum), 1e-12)
      }
    }

  /** MAJOR maintenance on the compressed tier — retrain-on-drift with
    * append-loss protection ([[Ivf.rebalanceSavedIndex]]'s contract,
    * reshaped by the lossy layout: PQ codes cannot reconstruct their
    * vectors, so unlike the plain-IVF rebalance — which retrains from
    * the full vectors its own lists store — the caller supplies the
    * retrain `corpus`). One call retrains both quantizers over
    * `corpus`, recomputes codes + norms, commits all four members,
    * and swings the root once; with iters = 0 the result is
    * bit-identical to a one-shot [[buildIndex]]+[[save]] over the
    * same corpus, which is what `q_cosine_ivfpq_rebalanced` gates.
    *
    * Append-loss protection — the hole a raw re-[[save]] leaves open:
    * save() reads its root-CAS expectation at PUBLISH time, so an
    * append that lands during the rebuild is silently overwritten by
    * a quadruple built from a corpus that never held it. Here three
    * fences close it:
    * (a) CENSUS — every id durably committed to the LIVE norms table
    *     must appear in `corpus` (one id-only pass over two pruned
    *     columns before any rebuild work — a full-outer join in the
    *     deterministic probe mode, where the same pass also counts the
    *     not-yet-indexed extras that disable the skip); a stale corpus
    *     fails loudly instead of dropping vectors — this also covers
    *     a CRASHED append's committed-but-unpublished ids, because
    *     the census reads the member's live version, not the root pin;
    * (b) MEMBER CAS — the codes/n2 rewrites carry `expectedVersion` =
    *     the censused versions, so an append landing after the census
    *     fails the rewrite commit, never a reader;
    * (c) ROOT CAS — the publish pins the snapshot generation.
    * Losing any fence retries the loop: the census re-runs over the
    * fresh state (the racing append's ids are in the live norms now —
    * a corpus that covers them rebuilds them in; one that does not
    * fails the census). A live generation AHEAD of the root pin heals
    * first, exactly as [[addToSavedIndex]]: an n2-complete rewrite
    * publishes forward, an incomplete one refuses (re-run save() to
    * heal), an append chain publishes forward. A crash between this
    * rewrite's member commits and its root swing is the same
    * crashed-re-save window those heals already close — member commit
    * order (cents, cb, codes, n2, root) is save()'s, so n2-ahead
    * still certifies a complete quadruple. */
  def rebalanceSavedIndex(s: SparkSession, path: String, corpus: DataFrame,
      nLists: Int = 16, m: Int = 8, k: Int = 16,
      itersCoarse: Int = 0, itersPq: Int = 0,
      driftTolerance: Double = 0.0,
      beforeMembersCommit: () => Unit = () => (),
      beforeRootPublish: () => Unit = () => ()): Unit = {
    import graft.land.AtomicLanding
    val codesT = s"$path/codes"
    val n2T = s"$path/n2"
    var done = false
    while (!done) {
      val snap = AtomicLanding.linkedSnapshot(path).getOrElse(
        throw new IllegalStateException(s"no saved IVF-PQ index at $path"))
      val cLive = AtomicLanding.currentVersion(codesT).get
      val nLive = AtomicLanding.currentVersion(n2T).get
      def rewriteAhead(t: String, pin: Long, live: Long): Boolean =
        live != pin && !AtomicLanding.dirsOfVersion(t, pin).toSet
          .subsetOf(AtomicLanding.dirsOfVersion(t, live).toSet)
      if (cLive != snap.members("codes") || nLive != snap.members("n2")) {
        if (rewriteAhead(codesT, snap.members("codes"), cLive) &&
            !rewriteAhead(n2T, snap.members("n2"), nLive))
          throw new IllegalStateException(
            s"$path: a crashed re-save left an incomplete member rewrite " +
              "(codes ahead of the root pin, n2 not) — re-run save() over " +
              "the intended index to heal before rebalancing")
        try AtomicLanding.publishLinked(path, Map(
          "cents" -> AtomicLanding.currentVersion(s"$path/cents").get,
          "cb" -> AtomicLanding.currentVersion(s"$path/cb").get,
          "codes" -> cLive, "n2" -> nLive),
          expectedRoot = Some(snap.rootVersion))
        catch { case _: java.util.ConcurrentModificationException => () }
      } else {
        // CENSUS — one id-only pass serves both fences: `missing`
        // (indexed ids absent from the corpus — always fatal) and, in
        // the deterministic probe mode, `extras` (corpus ids not yet
        // indexed — a grow-under-rebalance that disables the skip).
        // A full-outer join over the two pruned id columns replaces
        // the former missing anti-join + extras anti-join pair, so the
        // probe pays ONE corpus-shaped shuffle of ids, not two.
        val probeMode = itersCoarse == 0 && itersPq == 0
        val n2ids = AtomicLanding.readVersion(s, n2T, nLive)
          .select(col("vec_id")).withColumn("_idx", lit(1))
        val (missing, extras) =
          if (probeMode) {
            val r = n2ids
              .join(corpus.select(col("vec_id")).withColumn("_cor", lit(1)),
                Seq("vec_id"), "full_outer")
              .agg(
                coalesce(sum(when(col("_cor").isNull, 1L)), lit(0L)),
                coalesce(sum(when(col("_idx").isNull, 1L)), lit(0L)))
              .head()
            (r.getLong(0), r.getLong(1))
          } else
            (n2ids.drop("_idx")
              .join(corpus.select(col("vec_id")), Seq("vec_id"), "left_anti")
              .count(), -1L)
        require(missing == 0L,
          s"$path: rebalance corpus is stale — $missing indexed ids are " +
            "absent from it; rebuilding would silently drop those vectors")
        // DRIFT PROBE — skip the corpus-sized recode when retraining
        // would reproduce the LIVE quantizer pair. Appends were encoded
        // under exactly these tables, so unchanged tables make the
        // rebuild provably a no-op: the skip is an exactness argument,
        // not a recall heuristic (driftTolerance > 0 additionally skips
        // sub-threshold centroid movement — that IS a recall trade, the
        // caller's). Probed only in the deterministic iters = 0 mode
        // (training there is the corpus's canonical seed slices — a few
        // driver-side rows, O(1) next to the recode); Lloyd-trained
        // rebalances pay corpus passes to train and always rebuild.
        // The skip also demands corpus ≡ indexed ids both ways: a
        // corpus carrying EXTRA ids is a grow-under-rebalance and must
        // rebuild them in.
        val skipRebuild = probeMode && extras == 0L && {
          val centsOld = AtomicLanding
            .readVersion(s, s"$path/cents", snap.members("cents"))
            .orderBy("cid").collect()
            .map(_.getAs[scala.collection.Seq[Float]]("cvec")
              .map(_.toDouble).toSeq).toSeq
          // both seed fetches below are id-prefix-bounded (Ivf.seedPrefix
          // inside train; explicit here for the PQ seed rows), so the
          // probe's wide-column reads are row-group-pruned to the seed
          // prefix — the probe's only corpus-shaped work is the single
          // id census above
          val centsNew = Ivf.train(corpus, nLists, 0)
          withinDrift(centsOld,
            centsNew.map(_._2.map(_.toDouble)), driftTolerance) && {
            val dim = corpus.select(size(col("embedding")))
              .head().getInt(0)
            dim % m == 0 && {
              val subDim = dim / m
              val seedRes = residuals(
                  Ivf.seedPrefix(corpus, k).orderBy(col("vec_id")).limit(k),
                  centsNew)
                .orderBy(col("vec_id")).collect()
                .map(_.getAs[scala.collection.Seq[Double]]("res").toSeq)
              val cbNew = (for {
                sI <- 0 until m
                (v, j) <- seedRes.zipWithIndex.toSeq
              } yield (sI, j, v.slice(sI * subDim, (sI + 1) * subDim)))
                .sortBy(t => (t._1, t._2)).map(_._3)
              val cbOld = AtomicLanding
                .readVersion(s, s"$path/cb", snap.members("cb"))
                .orderBy("sub", "code").collect()
                .map(_.getAs[scala.collection.Seq[Double]]("rvec").toSeq)
                .toSeq
              withinDrift(cbOld, cbNew, driftTolerance)
            }
          }
        }
        if (skipRebuild) {
          rebalanceSkips.incrementAndGet()
          done = true
        } else {
        val idx = buildIndex(corpus, nLists, m, k, itersCoarse, itersPq)
        // test seam: fires after the census + rebuild, before any
        // member commit — the widest window a concurrent append can
        // land in
        beforeMembersCommit()
        try {
          val centsV = AtomicLanding.commit(
            coarseDf(s, idx.cents).coalesce(1), s"$path/cents")
          val cbV = AtomicLanding.commit(
            cbDf(s, idx.cb).coalesce(1), s"$path/cb")
          val codesV = AtomicLanding.commit(idx.codes, codesT,
            expectedVersion = Some(cLive),
            batchId = AtomicLanding.lastBatchId(codesT))
          val n2V = AtomicLanding.commit(idx.n2, n2T,
            expectedVersion = Some(nLive),
            batchId = AtomicLanding.lastBatchId(n2T))
          AtomicLanding.publishLinked(path,
            Map("cents" -> centsV, "cb" -> cbV,
              "codes" -> codesV, "n2" -> n2V),
            expectedRoot = Some(snap.rootVersion),
            beforePublish = beforeRootPublish)
          done = true
        } catch {
          case _: java.util.ConcurrentModificationException =>
            rebalanceRetries.incrementAndGet(); ()
        }
        }
      }
    }
  }

  /** Long-SESSION maintenance ([[Ivf.maintainSavedIndex]]'s shape on
    * the compressed tier — the quantizers are frozen and the codes/n2
    * tables carry no derived state, so maintenance is purely
    * physical): fold each append-session micro-batch tail
    * (`compactSmall` per member — body dirs above `smallBytes` never
    * rewrite; a concurrent append rides the compaction rebase), CAS
    * the root to the folded generations with cents/cb pinned
    * unchanged, then [[graft.land.AtomicLanding.vacuumLinked]]
    * reclaims superseded generations — quiescence-guarded, so a part
    * a concurrent writer pushed ahead of the root pin is never
    * touched. One maintainer at a time; concurrent probes/appends are
    * safe (every publish is a root CAS — a losing maintainer
    * re-resolves and retries). Returns reclaimed paths. */
  def maintainSavedIndex(s: SparkSession, path: String,
      smallBytes: Long = 64L * 1024 * 1024,
      reservationGraceMs: Long = 600000L,
      retainRootGenerations: Int = 0): Seq[String] = {
    import graft.land.AtomicLanding
    var done = false
    while (!done) {
      val snap = AtomicLanding.linkedSnapshot(path).getOrElse(
        throw new IllegalStateException(s"no saved IVF-PQ index at $path"))
      // same crashed re-save discipline as addToSavedIndex: folding a
      // rewritten live table and publishing it under the OLD pinned
      // quantizers would serve a mixed generation
      def rewriteAhead(t: String): Boolean = {
        val pin = snap.members(t)
        val live = AtomicLanding.currentVersion(s"$path/$t").get
        live != pin && !AtomicLanding.dirsOfVersion(s"$path/$t", pin).toSet
          .subsetOf(AtomicLanding.dirsOfVersion(s"$path/$t", live).toSet)
      }
      if (rewriteAhead("codes") || rewriteAhead("n2")) {
        if (rewriteAhead("n2")) {
          try AtomicLanding.publishLinked(path, Map(
            "cents" -> AtomicLanding.currentVersion(s"$path/cents").get,
            "cb" -> AtomicLanding.currentVersion(s"$path/cb").get,
            "codes" -> AtomicLanding.currentVersion(s"$path/codes").get,
            "n2" -> AtomicLanding.currentVersion(s"$path/n2").get),
            expectedRoot = Some(snap.rootVersion))
          catch { case _: java.util.ConcurrentModificationException => () }
        } else throw new IllegalStateException(
          s"$path: a crashed re-save left an incomplete member rewrite — " +
            "re-run save() over the intended index to heal before maintaining")
      } else {
      def folded(t: String): Long =
        try AtomicLanding.compactSmall(s, s"$path/$t", smallBytes)
        catch {
          // a concurrent rewrite landed mid-fold: skip this member for
          // this run (the next maintenance retries) but still heal the
          // root to whatever is durably committed
          case _: java.util.ConcurrentModificationException =>
            AtomicLanding.currentVersion(s"$path/$t").get
        }
      val cNew = folded("codes")
      val nNew = folded("n2")
      if (cNew == snap.members("codes") && nNew == snap.members("n2"))
        done = true
      else {
        try {
          AtomicLanding.publishLinked(path, Map(
            "cents" -> snap.members("cents"), "cb" -> snap.members("cb"),
            "codes" -> cNew, "n2" -> nNew),
            expectedRoot = Some(snap.rootVersion))
          done = true
        } catch {
          case _: java.util.ConcurrentModificationException => ()
        }
      }
      }
    }
    AtomicLanding.vacuumLinked(path, futureGraceMs = reservationGraceMs,
      retainRoots = retainRootGenerations)
  }

  /** Build + probe in one call (the coverage-query path). */
  def topK(emb: DataFrame, queries: DataFrame, k: Int, nLists: Int = 16,
      m: Int = 8, kCodes: Int = 16, nProbe: Int = 4, shortlist: Int = 50,
      itersCoarse: Int = 0, itersPq: Int = 0): DataFrame =
    probe(emb, buildIndex(emb, nLists, m, kCodes, itersCoarse, itersPq),
      queries, k, nProbe, shortlist)
}
