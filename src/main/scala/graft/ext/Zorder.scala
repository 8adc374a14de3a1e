package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of several columns
  * into one key, so that sorting by the key gives LOCALITY IN EVERY
  * DIMENSION at once — the layout move behind Delta's OPTIMIZE ZORDER,
  * generalizing [[graft.land.Landing.clusteredParquet]]'s 1-D range
  * clustering. At 100 TB the payoff is multi-column file/row-group
  * pruning: a range-clustered table prunes on its ONE sort column, a
  * z-ordered table prunes on EACH of the interleaved columns (each
  * file's parquet min/max footer range on every dimension spans only
  * ~N^(-1/k) of the domain for k interleaved columns), so selective
  * predicates on ANY of them skip whole files before a byte is read.
  *
  * The key is pure integer bit arithmetic (`shiftright`/`&`/`shiftleft`
  * /`|`) over masked non-negative inputs — codegen-friendly, no UDF,
  * and replayable verbatim in any engine with integer shifts, which is
  * what lets `q_zorder` hash-gate the exact key values against a DuckDB
  * replay. One range shuffle at write time, amortized over every
  * subsequent read (same cost model as `clusteredParquet`).
  */
object Zorder {

  /** Morton key: bit j of `cols(i)` lands at position `j * cols.size + i`
    * of the key. Each input is masked to `bits` low bits first (callers
    * pre-scale/mod their domain into that range; 16 bits × 2 cols fills
    * 32 key bits). `bits * cols.size` must stay ≤ 63 so the key is a
    * non-negative Long. */
  def zkey(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zkey needs at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits=$bits x ${cols.size} cols must fit a positive Long")
    val n = cols.size
    cols.zipWithIndex.map { case (c, i) =>
      val masked = c.cast("long").bitwiseAND(lit((1L << bits) - 1L))
      (0 until bits).map { j =>
        shiftleft(shiftright(masked, j).bitwiseAND(lit(1L)), j * n + i)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** The DuckDB replay of [[zkey]] — generated from the same (column,
    * bit) enumeration so the oracle can never drift from the Spark
    * expression by hand-editing. */
  def zkeySql(cols: Seq[String], bits: Int = 16): String = {
    val n = cols.size
    val mask = (1L << bits) - 1L
    cols.zipWithIndex.flatMap { case (c, i) =>
      (0 until bits).map { j =>
        s"((($c & $mask) >> $j & 1) << ${j * n + i})"
      }
    }.mkString(" | ")
  }

  /** Scale a column's [lo, hi] domain onto the full `bits` range with
    * exact integer arithmetic — THE step that makes interleaving work
    * on real data: without it a narrow dimension (say an 8-bit key id
    * interleaved with a 40-bit timestamp) contributes only zero high
    * bits, the sort degenerates to the wide column alone, and the
    * narrow column gets no file locality (the z-order pitfall this
    * module's spec caught on first contact with the fixture). Requires
    * `span * mask < 2^63`: span < 2^47 at 16 bits. */
  def scaled(colName: String, lo: Long, hi: Long, bits: Int): Column = {
    require(hi >= lo, s"empty domain [$lo, $hi]")
    require(hi - lo < (1L << (63 - bits)),
      s"domain span ${hi - lo} overflows the $bits-bit scaling")
    val mask = (1L << bits) - 1L
    // SQL `div` (exact integer division) — Column./ is floating and
    // loses bits past 2^53 on wide domains
    if (hi == lo) lit(0L)
    else expr(s"((cast($colName as bigint) - $lo) * $mask) div ${hi - lo}")
  }

  /** SQL twin of [[scaled]] for oracle generation (`//` = DuckDB
    * integer division). */
  def scaledSql(c: String, lo: Long, hi: Long, bits: Int): String =
    if (hi == lo) "0"
    else s"((($c - $lo) * ${(1L << bits) - 1L}) // ${hi - lo})"

  /** [[zkey]] over domain-scaled columns (named). */
  def zkeyScaled(cols: Seq[(String, Long, Long)], bits: Int = 16): Column =
    zkey(cols.map { case (c, lo, hi) => scaled(c, lo, hi, bits) }, bits)

  def zkeyScaledSql(cols: Seq[(String, Long, Long)], bits: Int = 16): String =
    zkeySql(cols.map { case (c, lo, hi) => scaledSql(c, lo, hi, bits) }, bits)

  /** `df` plus the scaled Morton key as `_zkey`. */
  def withKey(df: DataFrame, domains: Seq[(String, Long, Long)],
      bits: Int): DataFrame =
    df.withColumn("_zkey", zkeyScaled(domains, bits))

  /** Z-ordered parquet: probe each cluster column's domain (ONE bounded
    * aggregate — the same write-time cost class as the range shuffle),
    * scale, interleave, range-partition + sort on the key, write with
    * the key kept as `_zkey` (the cluster index column — dropping it
    * would also drop the in-file sort evidence). */
  def clusteredWrite(df: DataFrame, path: String, clusterCols: Seq[String],
      bits: Int, nFiles: Int): String = {
    val aggs = clusterCols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val domains = clusterCols.zipWithIndex.map { case (c, i) =>
      (c, row.getLong(2 * i), row.getLong(2 * i + 1))
    }
    val keyed = withKey(df, domains, bits)
    keyed.repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    path
  }
}
