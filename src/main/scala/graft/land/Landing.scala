package graft.land

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Raw-zone landing writers.
  *
  * The reference lands every extract as ONE csv file via
  * `repartition(1).write.csv(header=True, mode="overwrite")`
  * (`/root/reference/ingestion/utils/dataIngestionUtils.py:117-118`) — a
  * full shuffle into a single write task. At 100 TB that is the
  * anti-pattern called out in SURVEY §4 O4, so:
  *
  *  - [[csvCompat]] keeps the reference's single-file-with-header contract
  *    but uses `coalesce(1)` (narrow dependency — no shuffle) instead of
  *    `repartition(1)`;
  *  - [[parquet]] is the scale default: partitioned columnar output, with
  *    optional hive-style partition columns so downstream reads prune.
  */
object Landing {

  /** Single-file CSV with header, overwrite — byte-level compat mode. */
  def csvCompat(df: DataFrame, path: String): String = {
    df.coalesce(1).write
      .option("header", "true")
      .mode(SaveMode.Overwrite)
      .csv(path)
    path
  }

  /** Partitioned parquet — the scale-oriented default. `partitionBy`
    * columns become hive-style directories so Catalyst partition-prunes
    * downstream scans (SURVEY §2.2 P7 mapping).
    */
  def parquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): String = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
    path
  }
}
