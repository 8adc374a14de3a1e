package graft.land

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** ACID landing commits.
  *
  * The reference's commit point is write-then-catalog-insert
  * (`/root/reference/ingestion/dataIngestion.py:26-34`): the parquet/csv
  * write lands directly in the target prefix and the run record is
  * inserted afterwards, so a crash mid-write leaves partial files that
  * the next reader happily scans. This module closes that hole with the
  * manifest-pointer pattern (the primitive Delta Lake and Iceberg are
  * built on — no Delta jars exist in this container, so the primitive is
  * implemented directly):
  *
  * {{{
  * table/
  *   _CURRENT                 one small pointer file: "m-0000000042"
  *   manifests/m-0000000042   text manifest: one live data dir per line
  *   data/<uuid>/             immutable, fully-written parquet dirs
  *   .staging/<uuid>/         in-flight writes — readers never look here
  * }}}
  *
  * Commit protocol: (1) write the batch into a fresh staging dir;
  * (2) require the writer's `_SUCCESS` marker; (3) move the staging dir
  * under `data/` (same-filesystem rename — the dir is still unreachable:
  * no manifest lists it); (4) write the next manifest (previous dirs +
  * new dir for an append, just the new dir for an overwrite);
  * (5) publish by atomically replacing `_CURRENT`. A crash at any step
  * before (5) leaves `_CURRENT` untouched — readers keep the previous
  * snapshot; orphaned staging/data dirs are garbage, not data, and
  * [[vacuum]] removes them. On an object store the same protocol holds
  * with step (5) as the single conditional small-object PUT — data dirs
  * and manifests are immutable either way, so reader isolation never
  * depends on directory-rename atomicity. Single writer by design (the
  * reference's model); multi-writer needs a conditional pointer PUT,
  * same as Delta's optimistic protocol.
  */
object AtomicLanding {

  private val Pointer = "_CURRENT"

  private def manifestName(v: Long): String = f"m-$v%010d"

  private def pointerPath(table: String): Path = Paths.get(table, Pointer)

  /** The published version, if any commit has ever completed. */
  def currentVersion(table: String): Option[Long] = {
    val p = pointerPath(table)
    if (Files.exists(p))
      Some(Files.readString(p).trim.stripPrefix("m-").toLong)
    else None
  }

  private def manifestLines(table: String): Seq[String] =
    currentVersion(table) match {
      case None => Nil
      case Some(v) =>
        Files.readAllLines(Paths.get(table, "manifests", manifestName(v)))
          .asScala.toSeq.map(_.trim).filter(_.nonEmpty)
    }

  /** The data dirs of the published snapshot (relative to `table`). */
  private def liveDirs(table: String): Seq[String] =
    manifestLines(table).filterNot(_.startsWith("#"))

  /** The streaming batch id recorded by the last published commit, if
    * that commit carried one. Lives INSIDE the manifest, so it becomes
    * durable in the same atomic pointer swing as the data it describes —
    * there is no window where data is committed but its batch id is not. */
  def lastBatchId(table: String): Option[Long] =
    manifestLines(table).collectFirst {
      case l if l.startsWith("# batch ") => l.stripPrefix("# batch ").trim.toLong
    }

  /** Read the current snapshot — only ever sees fully-committed data. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val dirs = liveDirs(table)
    require(dirs.nonEmpty, s"no committed snapshot at $table")
    spark.read.parquet(dirs.map(d => s"$table/$d"): _*)
  }

  /** Time travel: read the snapshot a PAST commit published. Works until
    * [[vacuum]] reclaims the superseded manifests/data (the same
    * retention trade Delta's VACUUM makes). */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame = {
    val manifest = Paths.get(table, "manifests", manifestName(version))
    require(Files.exists(manifest), s"version $version not found (vacuumed?)")
    val dirs = Files.readAllLines(manifest).asScala.toSeq
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    spark.read.parquet(dirs.map(d => s"$table/$d"): _*)
  }

  /** Upsert (MERGE-by-key): rows of `updates` replace current rows with
    * the same `key`; unmatched keys are inserts. Snapshot-rewrite
    * semantics — the new version contains (current ANTI-JOIN updates)
    * UNION updates, published with the usual atomic swing. At 100 TB
    * per-partition rewrite with pruning (Delta's file-level MERGE) is
    * the refinement; the commit protocol is identical. */
  def merge(updates: DataFrame, table: String, key: String): Long = {
    val spark = updates.sparkSession
    val merged = read(spark, table)
      .join(updates.select(key), Seq(key), "left_anti")
      .unionByName(updates)
    // safe to read-while-writing: the staging write scans the OLD data
    // dirs, which stay on disk until a later vacuum — publishing only
    // swings the pointer
    commit(merged, table)
  }

  /** Write `df` and publish atomically; returns the committed version.
    * `append = true` keeps the previous snapshot's data dirs in the new
    * manifest (streaming micro-batches); `append = false` replaces the
    * table. `beforePublish` is a test seam: it runs after data is
    * staged/moved but before the pointer swings — exactly where a crash
    * must not lose the previous snapshot. */
  def commit(df: DataFrame, table: String, append: Boolean = false,
      beforePublish: () => Unit = () => (),
      batchId: Option[Long] = None): Long = {
    val next = currentVersion(table).getOrElse(-1L) + 1L
    val staging = Paths.get(table, ".staging", UUID.randomUUID().toString)
    Files.createDirectories(staging.getParent)

    df.write.parquet(staging.toString)
    require(Files.exists(staging.resolve("_SUCCESS")),
      s"writer did not mark $staging complete; refusing to publish")

    val dirName = staging.getFileName.toString
    val dataDir = Paths.get(table, "data", dirName)
    Files.createDirectories(dataDir.getParent)
    Files.move(staging, dataDir)

    val dirs = (if (append) liveDirs(table) else Nil) :+ s"data/$dirName"
    val lines = batchId.map(b => s"# batch $b").toSeq ++ dirs
    val manifest = Paths.get(table, "manifests", manifestName(next))
    Files.createDirectories(manifest.getParent)
    Files.write(manifest, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

    beforePublish()

    val tmp = Paths.get(table, s".$Pointer.${UUID.randomUUID()}")
    Files.write(tmp, manifestName(next).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerPath(table),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Streaming sink body: commit every micro-batch as an atomic append
    * (use with `writeStream.foreachBatch(AtomicLanding.streamSink(t))`).
    * Readers polling the table between batches always see a complete
    * prefix of the stream, never a half-written batch.
    *
    * EXACTLY-ONCE: foreachBatch is at-least-once — after a crash the
    * engine replays the last unacknowledged batch — so the sink skips
    * any batchId at or below the one recorded in the live manifest
    * (batch ids are monotonically increasing per checkpointed query,
    * and only the most recent batch is ever replayed). */
  def streamSink(table: String): (DataFrame, Long) => Unit =
    (df, batchId) =>
      if (!lastBatchId(table).exists(_ >= batchId)) {
        commit(df, table, append = true, batchId = Some(batchId)); ()
      }

  /** Compaction — the answer to the streaming small-file problem: every
    * appended micro-batch adds a data dir, and a long-running stream
    * leaves thousands of small files that tax every subsequent scan.
    * Rewrites the CURRENT snapshot into one fresh data dir (optionally
    * coalesced to `numFiles`) and publishes it with the usual atomic
    * swing; concurrent readers keep whichever manifest they already
    * resolved — the old dirs stay on disk until [[vacuum]]. The batch-id
    * watermark carries over so a replayed micro-batch is still skipped
    * after compaction. */
  def compact(spark: SparkSession, table: String,
      numFiles: Int = 0): Long = {
    val df0 = read(spark, table)
    val df = if (numFiles > 0) df0.coalesce(numFiles) else df0
    commit(df, table, batchId = lastBatchId(table))
  }

  /** Remove everything no reader can reach: all staging dirs (committed
    * ones were MOVED out, so anything left is an aborted write), data
    * dirs absent from the live manifest, and superseded manifests.
    * Returns paths removed. */
  def vacuum(table: String): Seq[String] = {
    val live = liveDirs(table).map(_.stripPrefix("data/")).toSet
    val current = currentVersion(table).map(manifestName)
    val doomed = Seq(
      Paths.get(table, ".staging") -> ((_: Path) => true),
      Paths.get(table, "data") ->
        ((p: Path) => !live.contains(p.getFileName.toString)),
      Paths.get(table, "manifests") ->
        ((p: Path) => !current.contains(p.getFileName.toString)))
    doomed.flatMap { case (dir, cond) =>
      if (!Files.exists(dir)) Nil
      else Files.list(dir).iterator().asScala.toSeq.filter(cond).map { p =>
        deleteRecursively(p); p.toString
      }
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
