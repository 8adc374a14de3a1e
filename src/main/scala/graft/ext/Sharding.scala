package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic global shuffle-shard writer — the training-data layout
  * stage: the curated corpus is dealt into N shards by a stable content
  * hash and pseudo-randomly ordered WITHIN each shard, so a trainer
  * streaming shard files sees data with source/time correlations broken,
  * and re-running the job reproduces the exact same layout (no RNG, no
  * row-order dependence — everything derives from the key).
  *
  * The reference framework has no training layout stage (its pipeline
  * ends at the raw zone, `/root/reference/ingestion/utils/
  * dataIngestionUtils.py:117-118`); this is part of the engine's
  * LLM-pipeline extension surface next to [[Sampling]] and [[Packing]].
  *
  * 100 TB design: one hash-partitioned shuffle (`repartition` on the
  * shard id), in-task sort for the within-shard order, parquet
  * `partitionBy` for the shard directories. Nothing global is
  * sequential: shard assignment is a pure per-row projection, and the
  * manifest is one nShards-row aggregate. Choose nShards so a shard is
  * a few GB (100 TB / 4 GB ≈ 25k shards — well within hash-partition
  * and directory-listing comfort).
  */
object Sharding {

  /** Stable shard id in [0, nShards): 60-bit md5 of the key, mod N —
    * engine-stable (DuckDB replays it), row-order independent. */
  def shardOf(key: Column, nShards: Int): Column =
    pmod(TextOps.hash60(key.cast("string")), lit(nShards))

  /** The within-shard shuffle order: an independent keyed hash (salted so
    * it does not correlate with the shard hash). */
  def orderOf(key: Column): Column =
    TextOps.hash60(concat(key.cast("string"), lit("#ord")))

  /** Input columns plus (shard, ord). */
  def assign(df: DataFrame, key: Column, nShards: Int): DataFrame =
    df.withColumn("shard", shardOf(key, nShards))
      .withColumn("ord", orderOf(key))

  /** Per-shard manifest: row count plus an order-independent content
    * fingerprint (bit_xor of the 60-bit content hash — no overflow, any
    * accumulation order). */
  def census(df: DataFrame, key: Column, content: Column, nShards: Int): DataFrame =
    assign(df, key, nShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        bit_xor(TextOps.hash60(content)).as("content_fp"))

  /** Deal `df` into `outDir/shard=K/` parquet, pseudo-randomly ordered
    * within each shard, and return the manifest (shard, n_rows,
    * content_fp) — also written to `outDir/_manifest`. The WRITE is one
    * compute pass (repartition carries rows to their shard's tasks, the
    * sort happens in-task, the parquet writer splits directories on the
    * shard column); the MANIFEST then costs a second, separate scan of
    * the written files — deliberate: reading back the landed layout
    * makes the manifest a proof of what actually landed, not of what
    * was intended, but a caller who trusts the write and cannot afford
    * re-reading the corpus should derive the census from the upstream
    * plan ([[census]]) instead. */
  def writeShards(df: DataFrame, key: Column, content: Column, nShards: Int,
      outDir: String): DataFrame = {
    assign(df, key, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), key)
      .drop("ord")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val manifest = df.sparkSession.read.parquet(outDir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        bit_xor(TextOps.hash60(content)).as("content_fp"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$outDir/_manifest")
    df.sparkSession.read.parquet(s"$outDir/_manifest")
  }
}
