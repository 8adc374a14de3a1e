package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table access + oracle-parity helpers shared by every query. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which the
    * vectorized reader refuses ([PARQUET_TYPE_ILLEGAL]). With
    * `spark.sql.legacy.parquet.nanosAsLong` set at session build
    * ([[graft.Sessions.build]]) the nanos arrive as long; truncate to
    * micros with integer division — exactly what DuckDB does natively when
    * it loads the same file, so oracle comparisons stay value-identical.
    * (The conf is session-wide and must NOT be flipped here per-read: a
    * mid-session mutation races any concurrent query.)
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Exact money arithmetic: cast to decimal BEFORE aggregating so the sum
    * is order-independent (double summation is not associative — a
    * parallel Spark sum and a sequential DuckDB sum would drift in the
    * last bits and hash-mismatch). Final cast back to double keeps the
    * output schema engine-neutral. The DuckDB oracles use the identical
    * `cast(sum(cast(x as decimal(18,2))) as double)` shape.
    */
  def dec(c: Column): Column = c.cast("decimal(18,2)")
  def money(c: Column): Column = sum(dec(c)).cast("double")
}
