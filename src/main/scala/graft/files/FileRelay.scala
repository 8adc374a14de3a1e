package graft.files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** File-pattern ingestion: relay opaque objects between zones.
  *
  * Re-expression of the reference's boto3 copy/move/list
  * (`/root/reference/ingestion/utils/dataIngestionUtils.py:196-232`) on the
  * Hadoop FileSystem API, so the same code runs against `s3a://`, `hdfs://`
  * and `file://` (hermetic tests — SURVEY §5.4). Objects stay opaque blobs;
  * no DataFrame job is launched for a byte relay.
  */
class FileRelay(conf: Configuration = new Configuration()) {

  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  /** List objects under a prefix (S4) —
    * `bucket.objects.filter(Prefix=...)` (`dataIngestionUtils.py:204`).
    * Overridable: the test suite injects a late-arriving object between
    * copy and delete to pin the moveAll no-data-loss contract. */
  def list(prefix: String): Seq[Path] = {
    val p = new Path(prefix)
    val f = fs(p)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toIndexedSeq.filter(_.isFile).map(_.getPath)
  }

  /** Cross-zone copy (S5) — `dataIngestionUtils.py:196-213`: every object
    * under `srcPrefix` lands under `destPrefix`, names preserved. Returns
    * (source, destination) pairs for the copied set. */
  def copyPairs(srcPrefix: String, destPrefix: String): Seq[(Path, Path)] = {
    val destDir = new Path(destPrefix)
    val dfs = fs(destDir)
    dfs.mkdirs(destDir)
    list(srcPrefix).map { src =>
      val dest = new Path(destDir, src.getName)
      FileUtil.copy(fs(src), src, dfs, dest, false, true, conf)
      src -> dest
    }
  }

  def copyAll(srcPrefix: String, destPrefix: String): Seq[Path] =
    copyPairs(srcPrefix, destPrefix).map(_._2)

  /** Move = copy + delete (S6) — `dataIngestionUtils.py:215-232`: archive
    * inbound files to the processed prefix. Deletes EXACTLY the objects
    * that were copied — never a fresh listing, so an object landing
    * between copy and delete survives for the next run (the reference
    * deletes each object only after copying that same object,
    * `dataIngestionUtils.py:225-231`).
    */
  def moveAll(srcPrefix: String, destPrefix: String): Seq[Path] = {
    val pairs = copyPairs(srcPrefix, destPrefix)
    pairs.foreach { case (src, _) => fs(src).delete(src, false) }
    pairs.map(_._2)
  }

  /** Archive EXACTLY the given objects — the listing is the CALLER's,
    * captured before whatever work the archive concludes, so an object
    * arriving under the same prefix after that snapshot is never swept
    * in ([[moveAll]]'s no-fresh-listing rule, pushed all the way to the
    * caller: a transactional ingest lists once, lands exactly that set,
    * and archives exactly that set). A source already absent is skipped,
    * and a copy that crashed before its delete re-copies (overwrite) —
    * so a retried partial move converges. */
  def moveExact(paths: Seq[Path], destPrefix: String): Seq[Path] = {
    val destDir = new Path(destPrefix)
    val dfs = fs(destDir)
    dfs.mkdirs(destDir)
    paths.filter(p => fs(p).exists(p)).map { src =>
      val dest = new Path(destDir, src.getName)
      FileUtil.copy(fs(src), src, dfs, dest, false, true, conf)
      fs(src).delete(src, false)
      dest
    }
  }

  def readUtf8(p: Path): String = {
    val in = fs(p).open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  def writeUtf8(p: Path, body: String): Unit = {
    val out = fs(p).create(p, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
