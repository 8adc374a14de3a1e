package graft.land

import java.net.URI
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** A local FileSystem that simulates S3-class object-store semantics —
  * the environment `AtomicLanding`'s no-rename commit path must survive:
  *
  *   - `rename` NEVER overwrites (returns false when the destination
  *     exists — an overwriting rename does not exist on S3) and is a
  *     NON-atomic copy-then-delete loop, like S3A's COPY-based rename;
  *   - `create(overwrite = false)` is an atomic create-if-absent
  *     (`O_EXCL`), modelling S3's conditional `If-None-Match` PUT — the
  *     primitive manifest-slot reservation relies on;
  *   - `create(overwrite = true)` buffers the write and makes it visible
  *     atomically at close, modelling whole-object PUT visibility
  *     (readers see the old object or the new one, never a torn write).
  *
  * Registered under the `nors3` scheme via
  * `fs.nors3.impl = graft.land.NoRenameFs` in the Hadoop conf; the spec
  * also lists `nors3` in `graft.acid.norename.schemes` so the pointer
  * swing selects the PUT store. If the rename-based store were ever
  * selected by mistake, every pointer replace after v0 would fail loudly
  * (rename onto an existing pointer returns false and no `nors3`
  * FileContext exists to fall back to).
  */
class NoRenameFs extends RawLocalFileSystem {
  override def getScheme: String = "nors3"
  override def getUri: URI = URI.create("nors3:///")

  private def local(p: Path): java.nio.file.Path =
    Paths.get(makeQualified(p).toUri.getPath)

  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) false // S3: no overwriting rename, for files OR dirs
    else {
      // non-atomic, like S3A: a copy loop followed by a source delete
      FileUtil.copy(this, src, this, dst, true, getConf)
    }
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val target = local(f)
    Files.createDirectories(target.getParent)
    if (!overwrite) {
      // conditional PUT: one O_EXCL open — concurrent creators race
      // atomically, exactly one wins
      val out = Files.newOutputStream(target,
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      new FSDataOutputStream(out, null)
    } else {
      // whole-object PUT: invisible until complete, then replaces
      // atomically at close
      val tmp = target.resolveSibling(
        s".put-${java.util.UUID.randomUUID()}-${target.getFileName}")
      val out = Files.newOutputStream(tmp,
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      new FSDataOutputStream(new java.io.FilterOutputStream(out) {
        override def close(): Unit = {
          super.close()
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        }
      }, null)
    }
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    create(f, overwrite, bufferSize, replication, blockSize, progress)
}
