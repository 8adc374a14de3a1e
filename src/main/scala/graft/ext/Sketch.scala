package graft.ext

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch: one-pass, bounded-memory frequency estimation over
  * an unbounded key domain — THE 100-TB frequency operator when exact
  * per-key counts would shuffle a vocabulary-sized table and all the
  * pipeline needs is (over-)estimates for a bounded query set or a
  * heavy-hitter threshold.
  *
  * Scale contract: the sketch is a d×w Long matrix held per partition
  * inside a partial aggregate (`Aggregator` reduce), merged by
  * element-wise SUM — associative and commutative, so the result is
  * independent of partition count and merge order, which is what makes
  * the row hash-gateable where order-sensitive summaries (Misra-Gries /
  * space-saving) are not. ONE corpus pass, no shuffle of the key domain;
  * the only exchange is d×w longs per partition collapsing to one row.
  * Estimates never undercount (every bucket sums a superset of the
  * term's occurrences); the standard bound `est − true ≤ e·n/w` holds
  * per row with probability `1 − e^−d` over hash choice — here the
  * hashes are FIXED (engine-replayable), so the sketch spec asserts the
  * deterministic guarantees (est ≥ exact; exact when no bucket
  * collides) instead of the probabilistic one.
  *
  * Bucket hash: ONE 60-bit md5 per term (the engine's cross-engine
  * [[TextOps.hash60]] convention), split into two 30-bit halves and
  * mixed per row Kirsch–Mitzenmacher-style — `bucket_i = (h_lo + i·h_hi)
  * mod w` (the standard double-hashing construction for Bloom/CMS row
  * families; KM 2006 shows it preserves the asymptotic bounds). One
  * digest + d integer mixes per input row instead of d digests, and
  * every intermediate stays < 2^32·d, so the identical arithmetic
  * replays overflow-free in the Spark estimate expression and the
  * DuckDB oracle (both engines error on BIGINT overflow). A production
  * deployment that doesn't need cross-engine replay would swap the md5
  * for `xxhash64` and keep the identical structure.
  */
object CountMin {

  final case class TermCount(term: String, cnt: Long)
  final case class CmsBuf(cells: Array[Long])

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Plan-time estimate evaluator carried by the native
    * [[graft.functions.CmsEst]] expression — the SAME digest + KM-mix
    * code path as the sketch-building aggregator, evaluated on the
    * UTF8String's UTF-8 bytes directly (no String allocation). */
  final class Evaluator(cells: Array[Long], d: Int, w: Int)
      extends Serializable {
    require(cells.length == d * w,
      s"sketch geometry mismatch: ${cells.length} cells != d=$d x w=$w")
    def est(term: org.apache.spark.unsafe.types.UTF8String): Long = {
      val h = hash60Bytes(term.getBytes)
      var m = Long.MaxValue
      var i = 0
      while (i < d) {
        val c = cells(i * w + bucketOf(h, i, w)); if (c < m) m = c; i += 1
      }
      m
    }
  }

  /** The term's 60-bit hash — value-identical to the SQL
    * `hash60(term)`: the first 15 lowercase hex chars of the md5 are
    * the first 15 NIBBLES of the digest, i.e. the big-endian long of
    * bytes 0–7 shifted right one nibble — extracted directly instead
    * of formatting and re-parsing hex (this runs once per input row).
    * SketchSpec pins scala-bucket ≡ SQL-expression-bucket. */
  def hash60(term: String): Long = hash60Bytes(term.getBytes("UTF-8"))

  def hash60Bytes(utf8: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val h = md.digest(utf8)
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | (h(j) & 0xffL); j += 1 }
    v >>> 4
  }

  /** Row i's bucket: KM double hashing over the two 30-bit halves. */
  def bucket(term: String, i: Int, w: Int): Int =
    bucketOf(hash60(term), i, w)

  def bucketOf(h: Long, i: Int, w: Int): Int = {
    val lo = h & 0x3FFFFFFFL
    val hi = h >>> 30
    ((lo + i * hi) % w).toInt
  }

  /** d×w counter matrix as a flat row-major array; merge = element sum. */
  final class CmsAgg(d: Int, w: Int)
      extends Aggregator[TermCount, CmsBuf, Seq[Long]] {
    def zero: CmsBuf = CmsBuf(new Array[Long](d * w))
    def reduce(b: CmsBuf, a: TermCount): CmsBuf = {
      val h = hash60(a.term) // ONE digest per row; d integer mixes
      var i = 0
      while (i < d) { b.cells(i * w + bucketOf(h, i, w)) += a.cnt; i += 1 }
      b
    }
    def merge(x: CmsBuf, y: CmsBuf): CmsBuf = {
      var i = 0
      while (i < x.cells.length) { x.cells(i) += y.cells(i); i += 1 }
      x
    }
    def finish(r: CmsBuf): Seq[Long] = r.cells.toSeq
    def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Build the sketch over a `(term, cnt)` stream → one row, `cells`
    * array<long> of length d·w. The input is typically the map-side
    * per-doc `word_counts` explode — no exchange before the partial
    * aggregate. */
  def sketch(termCounts: DataFrame, d: Int, w: Int): DataFrame = {
    val agg = udaf(new CmsAgg(d, w), Encoders.product[TermCount])
    termCounts.agg(agg(col("term"), col("cnt")).as("cells"))
  }

  /** The min-over-rows estimate as a Spark expression (no UDF) with the
    * sketch baked in as an ARRAY LITERAL; expects the term's 60-bit
    * hash pre-computed in column `_h` (one md5 per row — the KM mixes
    * are pure integer SQL). A literal, NOT a one-row crossJoin: joining
    * the sketch attaches the d·w-long array to EVERY probe row (8 KB ×
    * corpus rows of copied row data — measured 82 s at the 100× dir
    * before this), while a literal is one shared plan object. The
    * driver-side read of d·w longs is the bounded-collect precedent
    * (BPE merge tables, k-means seeds). */
  private def estExpr(cells: Array[Long], d: Int, w: Int) = {
    val arr = typedLit(cells.toSeq) // ONE shared literal, not one per row
    least((0 until d).map { i =>
      element_at(arr, expr(
        s"cast((_h % 1073741824 + $i * (_h div 1073741824)) % $w" +
          s" + ${i * w} + 1 as int)"))
    }: _*)
  }

  /** Bounded driver read of a sketch row, with the geometry check that
    * turns a d/w mismatch into a NAMED error instead of silently wrong
    * estimates (an out-of-range element_at returns null, which least()
    * would silently skip). */
  private def cellsOf(sk: DataFrame, d: Int, w: Int): Array[Long] = {
    val cells = sk.head().getAs[scala.collection.Seq[Long]]("cells").toArray
    require(cells.length == d * w,
      s"sketch geometry mismatch: ${cells.length} cells, caller expects d=$d x w=$w")
    cells
  }

  /** The total stream count, for free from any single sketch row (each
    * input row lands in exactly one bucket per row). */
  def totalOf(cells: Array[Long], w: Int): Long = {
    var s = 0L; var i = 0
    while (i < w) { s += cells(i); i += 1 }
    s
  }

  /** Point estimates for `terms` (column `term`) against a built sketch:
    * `min` over the d rows of each term's bucket. */
  def estimates(terms: DataFrame, sk: DataFrame, d: Int, w: Int): DataFrame =
    terms.withColumn("_h", TextOps.hash60(col("term")))
      .withColumn("est_count", estExpr(cellsOf(sk, d, w), d, w))
      .drop("_h")

  /** EXACT heavy hitters (terms whose true total count > `threshold`)
    * without a vocabulary-wide shuffle — the canonical two-pass sketch
    * workflow:
    *
    *  1. pass 1 builds the sketch (one scan, d×w longs exchanged);
    *  2. pass 2 re-scans and filters each `(term, cnt)` row MAP-SIDE by
    *     `est > threshold` against the broadcast sketch — `est ≥ exact`
    *     always, so a true heavy hitter can never be filtered out (ZERO
    *     false negatives by construction);
    *  3. only the surviving candidate rows shuffle into an exact
    *     `groupBy(term)`, whose `sum > threshold` check removes the
    *     sketch's false positives.
    *
    * Output is therefore EXACT (gate-able against a plain SQL threshold
    * query) while the exchange volume drops from |vocabulary| to
    * |candidates| — at 100 TB the difference between shuffling every
    * distinct key and shuffling the heavy tail plus collision noise.
    * Skew note: each surviving term's rows partially aggregate map-side
    * before the exchange, so even a 10%-of-corpus stopword contributes
    * one row per partition, not a hot shuffle key. */
  /** [[heavyHitters]] with the threshold as a fraction of the stream
    * (`total div denom`) — the total comes FREE from the sketch's first
    * row, so no separate corpus-scan aggregate is needed to size it. */
  def heavyHittersByFraction(termCounts: DataFrame, d: Int, w: Int,
      denom: Long): DataFrame = {
    val cells = cellsOf(sketch(termCounts, d, w), d, w)
    heavyHittersOn(termCounts, cells, d, w, totalOf(cells, w) / denom)
  }

  def heavyHitters(termCounts: DataFrame, d: Int, w: Int,
      threshold: Long): DataFrame =
    heavyHittersOn(termCounts, cellsOf(sketch(termCounts, d, w), d, w),
      d, w, threshold)

  private def heavyHittersOn(termCounts: DataFrame, cells: Array[Long],
      d: Int, w: Int, threshold: Long): DataFrame = {
    // The candidate filter runs once per CORPUS row, and its est is not
    // oracle-replayed (only the exact verified output is) — so it uses
    // the native [[graft.functions.CmsEst]] expression sharing the
    // aggregator's exact JVM hash path (one digest + d mixes on the raw
    // UTF8String bytes) instead of the SQL hash60 expression: an alias
    // referenced from a pushed-down predicate gets INLINED per
    // reference, and d buckets × (mod + div) re-evaluated the md5+conv
    // chain 8× per row (measured 70 s of 82 at the 100× dir). Writer
    // and reader sharing one code path also makes their agreement
    // structural rather than spec-pinned; the native expression (vs the
    // earlier typed UDF) keeps the filter inside whole-stage codegen
    // with no row-conversion or String allocation.
    val est = org.apache.spark.sql.GraftShims.column(
      graft.functions.CmsEst(
        org.apache.spark.sql.GraftShims.expression(col("term")),
        new Evaluator(cells, d, w)))
    termCounts
      .filter(est > lit(threshold))
      .groupBy(col("term"))
      .agg(sum(col("cnt")).as("n"))
      .filter(col("n") > lit(threshold))
  }

  /** CMS join-size estimate: `min` over the d rows of the row-wise
    * inner product Σ_b A[i][b]·B[i][b] — the classic sketch estimator
    * for `|A ⋈ B|` on a key (AGMS/CM inner-product bound: never an
    * undercount, since each row's product sums every true pair plus
    * collision cross-terms ≥ 0). This is the optimizer-style workload:
    * answer "will this join explode?" from two one-pass d×w summaries
    * WITHOUT shuffling either key domain — at 100 TB the alternative is
    * an exact pre-join frequency join that costs as much as the join
    * being sized. Both sketches must share (d, w) and the engine's
    * fixed hash family, which they do by construction. Driver cost:
    * 2·d·w longs (the bounded-collect precedent above).
    *
    * Overflow contract: Σ_b A[i][b]·B[i][b] ≤ totalA·totalB, so callers
    * stay exact while totalA·totalB < 2^63 — streams up to ~3e9 rows
    * each; beyond that, size rows/buckets so per-bucket products bound,
    * or estimate on a sampled stream. */
  def joinSizeEstimate(tcA: DataFrame, tcB: DataFrame,
      d: Int, w: Int): Long = {
    val a = sketchCells(tcA, d, w)
    // self-join sizing (Σ f(k)²) needs only ONE sketch — don't scan the
    // stream twice for the identical matrix
    val b = if (tcB eq tcA) a else sketchCells(tcB, d, w)
    joinSizeEstimateCells(a, b, d, w)
  }

  /** One corpus pass → the d×w cell matrix, geometry-checked. Public so
    * callers estimating several join sizes against the same stream build
    * its sketch once (the [[joinSizeEstimate]] overload is the
    * single-use convenience). */
  def sketchCells(tc: DataFrame, d: Int, w: Int): Array[Long] =
    cellsOf(sketch(tc, d, w), d, w)

  /** [[joinSizeEstimate]] on prebuilt cell matrices (both must share
    * (d, w) and the engine's fixed hash family). Per-row inner products
    * run in overflow-CHECKED arithmetic and saturate at Long.MaxValue:
    * past the documented ~3e9-row bound a silent wraparound would hand
    * the caller a garbage (possibly negative) "estimate", while
    * saturation keeps the never-undercount contract — a saturated row
    * is a true upper bound, and min() over rows still is too. */
  def joinSizeEstimateCells(a: Array[Long], b: Array[Long],
      d: Int, w: Int): Long = {
    require(a.length == d * w && b.length == d * w,
      s"sketch geometry mismatch: ${a.length}/${b.length} cells != d=$d x w=$w")
    (0 until d).map { i =>
      var s = 0L; var j = 0
      while (j < w && s != Long.MaxValue) {
        try s = Math.addExact(s, Math.multiplyExact(a(i * w + j), b(i * w + j)))
        catch { case _: ArithmeticException => s = Long.MaxValue }
        j += 1
      }
      s
    }.min
  }
}
