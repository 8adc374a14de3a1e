package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Fixture-table access + oracle-parity helpers shared by every query. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events fixture's `ts` physical type has drifted across fixture
    * generations — TIMESTAMP(NANOS) (read as long via the session-wide
    * `nanosAsLong` conf, see [[graft.Sessions.build]]) and timestamp[us]
    * (read as TIMESTAMP_NTZ) have both been observed. The engine must be
    * schema-agnostic at this boundary (the reference infers types from the
    * source; so do we): dispatch on the READ schema, normalizing every
    * variant to session-local TimestampType — the convention the oracle
    * hashes were minted under. With the session pinned to UTC the
    * NTZ→LTZ cast is value-identity, matching DuckDB's native read.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts",
      normalizeTs(raw.schema("ts").dataType, "ts", "events.ts"))
  }

  /** Normalize a drifting fixture timestamp column to TimestampType.
    * LongType = legacy nanos-as-long; throws a NAMED error on any type this
    * dispatch doesn't recognize, so the next fixture refresh fails loudly
    * instead of erring 27 queries downstream.
    */
  def normalizeTs(dt: DataType, colName: String, what: String): Column =
    dt match {
      case LongType         => timestamp_micros(expr(s"$colName div 1000"))
      case TimestampType    => col(colName)
      case TimestampNTZType => col(colName).cast(TimestampType)
      case other => throw new IllegalStateException(
        s"fixture drift: $what arrived as $other — expected long (nanos), " +
        "timestamp, or timestamp_ntz; teach Tables.normalizeTs the new type")
    }

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
