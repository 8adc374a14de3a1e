package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for the 100 TB regime (brief: "salting for skew, AQE
  * for runtime re-plan").
  *
  * Spark's AQE already splits skewed SORT-MERGE join partitions at
  * runtime (`spark.sql.adaptive.skewJoin`); salting is the static
  * counterpart for the cases AQE does not cover — skewed AGGREGATION
  * keys, and joins where one hot key floods a single task before AQE can
  * act. Both helpers keep exact semantics: results equal the unsalted
  * plan for any salt count.
  *
  * Decision rule (demonstrated in `ScaleOpsSpec`):
  *  - skewed JOIN, sort-merge: do nothing — AQE's OptimizeSkewedJoin
  *    splits the oversized partition into sub-reads at runtime and
  *    duplicates the matching partition on the other side (join
  *    semantics tolerate that). Prefer it over [[saltedJoin]]: zero code,
  *    and it acts on MEASURED sizes, not a guessed salt count.
  *  - skewed JOIN where the hot side must stay one partition (e.g. a
  *    later positional operation) or the join is not sort-merge:
  *    [[saltedJoin]].
  *  - skewed AGGREGATION: AQE cannot split a group — grouping requires
  *    key co-location, so `skewJoin` never fires on a groupBy exchange;
  *    [[saltedSumCount]]'s two-phase reduce is the tool.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side's hot keys
    * spread over `salts` sub-keys and the small side replicated once per
    * salt. Use when the small side is too large to broadcast and the big
    * side's key histogram has heavy hitters. Cost: small side is written
    * `salts` times into the shuffle — pick the smallest salt count that
    * flattens the histogram. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // spread by synthetic row id, not rand(). NOTE the limit: a row's id
    // (and so its salt) depends on partition layout and can change
    // under stage retry or AQE re-planning — fine HERE because join and
    // aggregate results are salt-value-independent (any spread works),
    // but never build salt-SENSITIVE logic (per-salt state, salt-keyed
    // sampling) on this; that needs a hash of real key columns
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltRange = explode(sequence(lit(0), lit(salts - 1))).as("_salt")
    val saltedSmall = small.select(col("*"), saltRange)
    saltedBig.join(saltedSmall,
        saltedBig(key) === saltedSmall(key) &&
          saltedBig("_salt") === saltedSmall("_salt"))
      .drop(saltedSmall(key)).drop(saltedSmall("_salt")).drop("_salt")
  }

  /** Two-phase skew-proof aggregation: partial aggregate on
    * (key, salt) — spreading a hot key over `salts` reducers — then final
    * aggregate on key. Decomposable aggregates only; sum/count provided.
    * (Spark's own partial aggregation already does map-side combine; the
    * extra salted REDUCE phase matters when a single key's partials still
    * overwhelm one reducer at the exchange.) */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn("_salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n"))
  }
}
