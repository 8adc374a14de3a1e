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
  * snapshot-pointer pattern (the same primitive Delta Lake and Iceberg
  * are built on — no Delta jars exist in this container, so the
  * primitive is implemented directly):
  *
  * {{{
  * table/
  *   _CURRENT                 one small pointer file: "v-0000000042"
  *   snapshots/v-0000000042/  immutable, fully-written data directories
  *   .staging/<uuid>/         in-flight writes — readers never look here
  * }}}
  *
  * Commit protocol: (1) write the full snapshot into a fresh staging
  * dir; (2) require the writer's `_SUCCESS` marker; (3) move the staging
  * dir into `snapshots/` (same-filesystem rename); (4) publish by
  * atomically replacing `_CURRENT` (write temp + `ATOMIC_MOVE`). A crash
  * at any step before (4) leaves `_CURRENT` untouched — readers keep the
  * previous snapshot; the orphaned staging dir is garbage, not data, and
  * [[vacuum]] removes it. On an object store the same protocol holds
  * with step (4) as the single conditional small-object PUT — the data
  * dirs are immutable either way, so reader isolation never depends on
  * directory-rename atomicity.
  */
object AtomicLanding {

  private val Pointer = "_CURRENT"

  private def snapshotName(v: Long): String = f"v-$v%010d"

  private def pointerPath(table: String): Path = Paths.get(table, Pointer)

  /** The published version, if any commit has ever completed. */
  def currentVersion(table: String): Option[Long] = {
    val p = pointerPath(table)
    if (Files.exists(p))
      Some(Files.readString(p).trim.stripPrefix("v-").toLong)
    else None
  }

  /** Read the current snapshot — only ever sees fully-committed data. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $table"))
    spark.read.parquet(s"$table/snapshots/${snapshotName(v)}")
  }

  /** Write `df` as the next snapshot and publish it atomically.
    * Returns the committed version. `beforePublish` is a test seam: it
    * runs after the data is staged but before the pointer swings, i.e.
    * exactly where a crash must not lose the previous snapshot. */
  def commit(df: DataFrame, table: String,
      beforePublish: () => Unit = () => ()): Long = {
    val next = currentVersion(table).getOrElse(-1L) + 1L
    val staging = Paths.get(table, ".staging", UUID.randomUUID().toString)
    Files.createDirectories(staging.getParent)

    df.write.parquet(staging.toString)
    require(Files.exists(staging.resolve("_SUCCESS")),
      s"writer did not mark $staging complete; refusing to publish")

    val snapDir = Paths.get(table, "snapshots", snapshotName(next))
    Files.createDirectories(snapDir.getParent)
    // an existing dir at `next` is an aborted commit that crashed between
    // snapshot-move and pointer-publish: _CURRENT never pointed at it, no
    // reader can reach it, so recovery reclaims the slot (single-writer
    // landing — the reference's model; multi-writer needs a conditional
    // pointer PUT, same as Delta's optimistic protocol)
    if (Files.exists(snapDir)) deleteRecursively(snapDir)
    Files.move(staging, snapDir)

    beforePublish()

    val tmp = Paths.get(table, s".$Pointer.${UUID.randomUUID()}")
    Files.write(tmp, snapshotName(next).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerPath(table),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Remove everything no reader can reach: all staging dirs (committed
    * ones were MOVED out, so anything left is an aborted write) and all
    * snapshots older than the published one. Returns paths removed. */
  def vacuum(table: String): Seq[String] = {
    val current = currentVersion(table).map(snapshotName)
    val doomed = Seq(
      Paths.get(table, ".staging") -> ((_: Path) => true),
      Paths.get(table, "snapshots") ->
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
