package graft.stream

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.lit

/** Exactly-once streaming sink into a JDBC table — the relational
  * counterpart of [[graft.land.AtomicLanding.streamSink]]'s
  * manifest-recorded batch id.
  *
  * `foreachBatch` is at-least-once: after a crash the engine replays the
  * last unacknowledged micro-batch. A DISTRIBUTED JDBC write cannot join
  * one transaction (every executor task holds its own connection), so the
  * batch lands in two steps:
  *
  *  1. The distributed write goes to a STAGE table (`<table>_stage`),
  *     never the target. `Overwrite` drops and recreates the stage, so
  *     any partial rows a crashed earlier attempt left behind are erased
  *     before this attempt's rows land.
  *  2. One driver-side transaction swings the batch into the target:
  *     DELETE the batch id (erases a replayed batch's earlier copy) +
  *     INSERT..SELECT from the stage. Readers never see the target
  *     between states — the old DELETE-then-append design exposed a
  *     window where the batch was missing; here the swap is atomic.
  *
  * Residual window, for the record: Spark's JDBC writer commits one
  * transaction per partition, so a task that COMMITS its stage rows but
  * dies before reporting success is retried and appends the partition
  * twice — into the stage. A same-attempt stage retry is the only way to
  * hit it (a failed attempt's transaction rolls back), and a batch
  * REPLAY is immune (step 1 rebuilds the stage from scratch). Stores
  * needing absolute exactness under that race key rows on
  * (batch_id, pk) and upsert; everything this engine tests (crash,
  * replay, partial leftovers) converges to exactly one copy per batch.
  *
  * At scale the DELETE is indexed on `batch_id` (one range per replay,
  * normally a no-op), the INSERT..SELECT is a server-side copy (no
  * second network round trip for the data), and the stage append runs
  * with the source's parallelism.
  */
final class JdbcBatchSink(url: String, props: Properties, table: String) {

  /** Use with `writeStream.foreachBatch(sink.apply _)`. */
  def apply(df: DataFrame, batchId: Long): Unit = {
    val stage = s"${table}_stage"
    val staged = df.withColumn("batch_id", lit(batchId))
    staged.write.mode(SaveMode.Overwrite).jdbc(url, stage, props)

    // the batch swing copies BY NAME in the target's column order: the
    // exact stored identifiers of both tables come from JDBC metadata
    // (Spark's writer quotes lowercase; user DDL folds — usually upper),
    // so a pre-existing target with the same columns in a DIFFERENT
    // order gets each value in the right column, and a target whose
    // column SET differs fails loudly instead of cross-wiring
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      val meta = conn.getMetaData
      // metadata lookups take LIKE patterns where '_' is a wildcard —
      // unescaped, a sibling like 'eventsXout' would satisfy the
      // 'events_out' probe, CREATE would be skipped, and every batch
      // would die on the missing target
      val esc = meta.getSearchStringEscape
      def likeEscape(s: String): String =
        s.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
      // probe every identifier fold (Derby/H2 store unquoted names
      // upper, PostgreSQL lower) — an upper-only probe on a
      // lower-folding store would re-CREATE every batch and die on the
      // second one
      val exists = Seq(table, table.toUpperCase, table.toLowerCase)
        .distinct.exists { t =>
          val rs = meta.getTables(null, null, likeEscape(t), null)
          try rs.next() finally rs.close()
        }
      val st = conn.createStatement()
      try {
        if (!exists)
          st.executeUpdate(
            s"CREATE TABLE $table AS SELECT * FROM $stage WITH NO DATA")
        // resolve the exact stored column names of both tables, trying
        // every identifier fold (as-given / upper / lower)
        def cols(t: String): Seq[String] = {
          val rs = meta.getColumns(null, null, likeEscape(t), null)
          val b = Seq.newBuilder[String]
          try while (rs.next()) b += rs.getString("COLUMN_NAME") finally rs.close()
          b.result()
        }
        def resolved(t: String): Seq[String] =
          Seq(t, t.toUpperCase, t.toLowerCase).distinct.map(cols)
            .find(_.nonEmpty).getOrElse(Nil)
        val stageCols = resolved(stage)
        val targetCols = resolved(table)
        require(stageCols.nonEmpty && targetCols.nonEmpty,
          s"column metadata unresolved: stage=$stageCols target=$targetCols")
        require(targetCols.map(_.toLowerCase).sorted ==
            stageCols.map(_.toLowerCase).sorted,
          s"target $table columns $targetCols are not the stage's " +
            s"$stageCols — refusing a cross-wired copy")
        def q(n: String) = "\"" + n + "\""
        val bcol = targetCols.find(_.equalsIgnoreCase("batch_id")).map(q)
          .getOrElse("batch_id")
        val del = conn.prepareStatement(s"DELETE FROM $table WHERE $bcol = ?")
        try { del.setLong(1, batchId); del.executeUpdate(); () } finally del.close()
        val insCols = targetCols.map(q).mkString(", ")
        val selCols = targetCols
          .map(tc => q(stageCols.find(_.equalsIgnoreCase(tc)).get)).mkString(", ")
        st.executeUpdate(
          s"INSERT INTO $table ($insCols) SELECT $selCols FROM $stage")
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    } finally conn.close()
  }
}
