package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators (SURVEY §2.6: `KeyValueGroupedDataset
  * .mapGroupsWithState` / `flatMapGroupsWithState` for state the built-in
  * windowed aggregations can't express). State lives in the checkpointed
  * state store: it survives micro-batches AND restarts, which is what
  * makes the counts exact across `Trigger.AvailableNow` re-runs.
  */
object Stateful {

  final case class UserEvent(userId: Long, eventId: Long)
  final case class UserState(nTotal: Long, maxEventId: Long)
  final case class UserUpdate(userId: Long, nTotal: Long, maxEventId: Long)

  /** Running per-user totals across ALL micro-batches ever processed —
    * a lifetime aggregate, not a window: each batch emits the updated
    * lifetime count for the users it touched. */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val prev = state.getOption.getOrElse(UserState(0L, Long.MinValue))
          var n = prev.nTotal
          var mx = prev.maxEventId
          rows.foreach { e => n += 1; if (e.eventId > mx) mx = e.eventId }
          val next = UserState(n, mx)
          state.update(next)
          Iterator.single(UserUpdate(key, next.nTotal, next.maxEventId))
      }
  }

  /** Cross-batch exactly-once dedup on an id column: the state store
    * remembers seen ids, so a record replayed in a LATER batch (retries,
    * at-least-once sources) is dropped — the streaming analog of the
    * exact-dedup tier in [[graft.ext.Dedup]]. `withWatermark` upstream
    * bounds the state for production runs; unbounded here mirrors
    * `dropDuplicates` semantics. */
  def dedupeById(stream: DataFrame, idCol: String): DataFrame =
    stream.dropDuplicates(Seq(idCol))

  /** The unbounded-stream dedup path: [[dedupeById]]'s state grows with
    * every key ever seen, which on a real (non-draining) stream is a
    * leak. This variant watermarks event time and uses
    * `dropDuplicatesWithinWatermark`, so a key's state is EVICTED once
    * the watermark passes its event time — state holds only the recent
    * window. The trade: a replay arriving after its key was evicted is
    * dropped by the watermark as late data (not matched against state),
    * so dedup is guaranteed only for duplicates within `lateness` of the
    * first arrival — the standard at-least-once-source contract. */
  def dedupeByIdWithinWatermark(stream: DataFrame, idCol: String,
      tsCol: String, lateness: String): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(Seq(idCol))
}
