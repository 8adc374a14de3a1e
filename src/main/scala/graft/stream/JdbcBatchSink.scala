package graft.stream

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.lit

/** Exactly-once streaming sink into a JDBC table — the relational
  * counterpart of [[graft.land.AtomicLanding.streamSink]]'s
  * manifest-recorded batch id.
  *
  * `foreachBatch` is at-least-once: after a crash the engine replays the
  * last unacknowledged micro-batch. A DISTRIBUTED JDBC write cannot join
  * one transaction (every executor task holds its own connection), so
  * instead of a transactional watermark this sink makes each batch write
  * IDEMPOTENT: rows carry their `batch_id`, and the driver deletes any
  * rows of that id before the distributed append. A replay — even of a
  * partially-written batch — first erases the partial leftovers, then
  * rewrites the batch whole; the table converges to exactly one copy of
  * every batch. This is the standard effectively-once recipe for stores
  * without cross-connection transactions.
  *
  * At scale the DELETE is indexed on `batch_id` (one range per replay,
  * normally a no-op) and the append runs with the source's parallelism,
  * `numPartitions`-throttled by the caller if the store needs it.
  */
final class JdbcBatchSink(url: String, props: Properties, table: String) {

  /** Use with `writeStream.foreachBatch(sink.apply _)`. */
  def apply(df: DataFrame, batchId: Long): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.prepareStatement(s"DELETE FROM $table WHERE batch_id = ?")
      try { st.setLong(1, batchId); st.executeUpdate(); () } finally st.close()
    } finally conn.close()
    df.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Append).jdbc(url, table, props)
  }
}
