package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar (per-dimension int8) quantization for embedding columns — the
  * standard first step of ANN index compression: 4× smaller vectors than
  * float32, which at 100 TB is the difference between an index that fits
  * executor memory and one that doesn't. Product quantization would
  * subdivide dimensions into codebooks; per-dimension scalar quantization
  * is its degenerate (1-dim subspace) form and needs no training beyond
  * the per-dimension min/max.
  *
  * Determinism: the quantization chain is a FIXED sequence of IEEE double
  * ops — `floor((x - mn) * 254 / (mx - mn)) - 127` — on exact inputs
  * (float casts and column min/max involve no accumulation), so codes are
  * bit-identical in any engine that follows the same chain.
  */
object Quantize {

  /** Per-dimension (pos, mn, mx) over the whole corpus: one posexplode +
    * one aggregation — the "training" scan. Output is `dim` rows (64
    * here), broadcastable everywhere. */
  def dimStats(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))

  /** Quantize each vector to int8 codes in [-127, 127]. The corpus is
    * scanned once, exploded to (vec, pos) pairs, coded against the
    * broadcast per-dimension stats, and re-assembled in position order.
    * A constant dimension (mx == mn) codes to 0. */
  def int8Codes(emb: DataFrame): DataFrame =
    int8CodesWith(emb, dimStats(emb))

  /** [[int8Codes]] against FROZEN stats — the production quantizer
    * contract every persisted index in the engine follows: stats are
    * trained once (on the seed corpus) and later batches code against
    * them without retraining, so codes are append-order-independent and
    * a grown state is bit-identical to a one-shot build with the same
    * seed. A batch value outside the frozen envelope clamps to the int8
    * boundary (for a seed-covering corpus the clamp is a no-op — the
    * affine map lands in [-127, 127] by construction).
    *
    * MAP-ONLY (r20, guide §2.4): the stats table folds to ONE row of
    * position-ordered envelope arrays (dim structs — bounded by
    * contract), broadcast into the corpus scan, and each vector codes in
    * place via an indexed `transform` — the same per-element IEEE chain,
    * bit-identical codes. The previous shape posexplode'd the corpus to
    * N×dim rows, broadcast-joined the stats, and re-assembled each
    * vector through a corpus×dim groupBy exchange plus a per-vector
    * sort; at 100 TB that exchange carried dim× the corpus for a value
    * the scan can compute where it stands. (Edge divergence, documented:
    * a null/empty `embedding` used to vanish from the output via the
    * explode; it now yields a null/empty `codes` row — no engine corpus
    * contains either.) */
  def int8CodesWith(emb: DataFrame, stats: DataFrame): DataFrame = {
    val statsRow = stats
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"), col("mx"))))
        .as("_pmm"))
    val codes = transform(col("embedding"), (v, i) => {
      val st = element_at(col("_pmm"), (i + lit(1)).cast("int"))
      val mn = st.getField("mn")
      val mx = st.getField("mx")
      when(mx === mn, lit(0L)).otherwise(
        greatest(lit(-127L), least(lit(127L),
          floor((v.cast("double") - mn) * lit(254.0d) / (mx - mn))
            .cast("long") - 127L)))
    })
    emb.crossJoin(broadcast(statsRow))
      .select(col("vec_id"), codes.as("codes"))
  }
}
