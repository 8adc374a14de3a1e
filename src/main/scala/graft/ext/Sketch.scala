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
  * Bucket hash: the engine's cross-engine md5 convention
  * ([[TextOps.hash60]] — first 15 md5 hex chars of `term#i` as a 60-bit
  * value, mod w), computed identically in the Scala aggregator, the
  * Spark estimate expression, and the DuckDB oracle replay. A
  * production deployment that doesn't need cross-engine replay would
  * swap in `xxhash64` and keep the identical structure.
  */
object CountMin {

  final case class TermCount(term: String, cnt: Long)
  final case class CmsBuf(cells: Array[Long])

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Row i's bucket for `term` — MUST stay value-identical to the SQL
    * `hash60(concat(term, '#', i)) % w` used in [[estimates]] and the
    * DuckDB oracles. The first 15 lowercase hex chars of the md5 are
    * the first 15 NIBBLES of the digest, i.e. the big-endian long of
    * bytes 0–7 shifted right one nibble — extracted directly instead
    * of formatting and re-parsing hex (this runs d× per input row).
    * SketchSpec pins scala-bucket ≡ SQL-expression-bucket. */
  def bucket(term: String, i: Int, w: Int): Int = {
    val md = digest.get()
    md.reset()
    val h = md.digest((term + "#" + i).getBytes("UTF-8"))
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | (h(j) & 0xffL); j += 1 }
    ((v >>> 4) % w).toInt
  }

  /** d×w counter matrix as a flat row-major array; merge = element sum. */
  final class CmsAgg(d: Int, w: Int)
      extends Aggregator[TermCount, CmsBuf, Seq[Long]] {
    def zero: CmsBuf = CmsBuf(new Array[Long](d * w))
    def reduce(b: CmsBuf, a: TermCount): CmsBuf = {
      var i = 0
      while (i < d) { b.cells(i * w + bucket(a.term, i, w)) += a.cnt; i += 1 }
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

  /** Point estimates for `terms` (column `term`) against a built sketch:
    * `min` over the d rows of each term's bucket — computed as a Spark
    * expression over the broadcast one-row sketch, no UDF. */
  def estimates(terms: DataFrame, sk: DataFrame, d: Int, w: Int): DataFrame = {
    val est = least((0 until d).map { i =>
      element_at(col("cells"),
        (pmod(TextOps.hash60(concat(col("term"), lit("#"), lit(i.toString))),
          lit(w.toLong)) + lit(i.toLong * w) + 1).cast("int"))
    }: _*)
    terms.crossJoin(broadcast(sk))
      .withColumn("est_count", est)
      .drop("cells")
  }
}
