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

  /** Range-clustered parquet: `repartitionByRange` + in-partition sort on
    * the cluster columns, so each output file covers a DISJOINT value
    * range and its parquet min/max statistics actually prune — a scan
    * with a selective predicate on the cluster column skips whole files
    * and row groups instead of reading everything and filtering. This is
    * the layout move (Delta ZORDER's 1-D case) that turns a 100 TB
    * time-range query into a few-file read. One range shuffle at write
    * time, amortized over every subsequent read. */
  def clusteredParquet(df: DataFrame, path: String,
      clusterCols: Seq[String], nFiles: Int): String = {
    require(clusterCols.nonEmpty, "clusteredParquet needs a cluster column")
    import org.apache.spark.sql.functions.col
    val cols = clusterCols.map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
    path
  }

  /** Bucketed catalog table: co-locates rows by hash(bucketCols) at WRITE
    * time so later equi-joins/aggregations on those columns run with NO
    * exchange at all — the pre-shuffled layout both sides of a recurring
    * big-big join should land in (brief: "bucketing for co-located
    * joins"). Requires a catalog table (bucket metadata lives there, not
    * in the files).
    */
  def bucketedTable(df: DataFrame, table: String,
      bucketCols: Seq[String], buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketedTable needs at least one bucket column")
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }
}
