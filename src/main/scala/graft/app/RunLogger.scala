package graft.app

import java.time.Instant

/** Run logging — re-expression of the reference `Logger`
  * (`/root/reference/ingestion/utils/logger.py:26-165`): level-tagged
  * lines to pluggable sinks (console / file / in-memory buffer that can be
  * shipped to object storage after the run), plus a `timed` block that
  * plays the `@log` decorator's role. Two deliberate divergences:
  * exceptions are logged AND rethrown (the reference swallows every
  * exception after logging, `dataIngestion.py:36-37` — a silent-failure
  * factory), and the ship-to-storage path takes the buffered lines
  * explicitly instead of reaching for globals (the reference's error path
  * calls `write_logs_to_s3()` with missing args, `logger.py:156-157`).
  */
trait LogSink {
  def write(line: String): Unit
}

final class ConsoleSink extends LogSink {
  def write(line: String): Unit = Console.err.println(line)
}

final class FileSink(path: String) extends LogSink {
  private val w = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    new java.io.PrintWriter(new java.io.FileWriter(f, true))
  }
  def write(line: String): Unit = { w.println(line); w.flush() }
}

/** Collects lines in memory for post-run shipping (the reference's
  * StringIO S3 handler, `logger.py:58-75,107-127`). */
final class BufferSink extends LogSink {
  private val buf = new StringBuilder
  def write(line: String): Unit = buf.append(line).append('\n')
  def contents: String = buf.result()
}

final class RunLogger(sinks: Seq[LogSink], clock: () => Instant = () => Instant.now()) {

  private def emit(level: String, msg: String): Unit = {
    val line = s"${clock()} [$level] $msg"
    sinks.foreach(_.write(line))
  }

  def info(msg: String): Unit = emit("INFO", msg)
  def warn(msg: String): Unit = emit("WARN", msg)
  def error(msg: String): Unit = emit("ERROR", msg)

  /** Log entry/exit/duration of a named step; log and RETHROW failures. */
  def timed[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    info(s"$name: start")
    try {
      val r = f
      info(f"$name: done in ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    } catch {
      case e: Throwable =>
        error(s"$name: failed: ${e.getMessage}")
        throw e
    }
  }

  /** Ship a buffered log to storage via the Hadoop FS API (the S3 log
    * path of `dataIngestionUtils.py:244` / `logger.py:107-127`). */
  def ship(buffer: BufferSink, relay: graft.files.FileRelay, dest: String): Unit =
    relay.writeUtf8(new org.apache.hadoop.fs.Path(dest), buffer.contents)
}

object RunLogger {
  def console(): RunLogger = new RunLogger(Seq(new ConsoleSink))
}
