package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured-Streaming surface of the engine. The crawl loop itself is
  * deliberately a batch-wave loop over snapshot tables (SURVEY.md §2.9 —
  * discovery_time is a logical sequence, nothing arrives late); what IS
  * naturally a stream is fetch telemetry: per-host rates and running
  * politeness accounting over live fetcher events.
  */
object CrawlTelemetry {

  /** One fetch observation from the fetcher fleet. */
  case class FetchEvent(ts: java.sql.Timestamp, host: String, bytes: Long, ok: Boolean)

  /** Event-time windowed per-host fetch rates with a watermark for late
    * telemetry: the standard readStream -> withWatermark -> window agg.
    */
  def hostRates(events: DataFrame, windowLen: String = "10 seconds",
                watermark: String = "30 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("host"))
      .agg(
        count(lit(1)).as("fetches"),
        sum(col("bytes")).as("bytes"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("ok_count"))

  /** Stateful running per-host totals (mapGroupsWithState): the streaming
    * spelling of per-host politeness accounting — state survives across
    * micro-batches.
    */
  def hostTotals(events: Dataset[FetchEvent]): Dataset[(String, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.host)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (host: String, batch: Iterator[FetchEvent], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + batch.size.toLong
          state.update(total)
          (host, total)
      }
  }

  /** In-progress per-host session state. */
  case class SessionState(start: Long, last: Long, fetches: Long, bytes: Long)

  /** A closed fetch session: a burst of fetches against one host with no
    * gap longer than the session gap.
    */
  case class HostSession(host: String, start: java.sql.Timestamp,
                         end: java.sql.Timestamp, fetches: Long, bytes: Long)

  /** Per-host fetch sessionization — flatMapGroupsWithState with an
    * EVENT-TIME timeout: a host's session closes (and emits exactly one
    * row) once the watermark passes last-event + gap. The canonical
    * arbitrary-stateful-streaming shape: state evolves per key across
    * micro-batches and emission is decoupled from input (0 rows while a
    * session is open, 1 when it dies).
    */
  def hostSessions(events: Dataset[FetchEvent],
                   gapSeconds: Long = 30L,
                   watermark: String = "30 seconds"): Dataset[HostSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.host)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (host: String, batch: Iterator[FetchEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(HostSession(host, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.fetches, s.bytes))
          } else {
            var s = state.getOption.getOrElse(
              SessionState(Long.MaxValue, Long.MinValue, 0L, 0L))
            batch.foreach { e =>
              val t = e.ts.getTime
              s = SessionState(math.min(s.start, t), math.max(s.last, t),
                s.fetches + 1, s.bytes + e.bytes)
            }
            state.update(s)
            // clamp: withWatermark does not drop late rows before fMGWS, so
            // a group fed only late events could compute last+gap BEHIND the
            // current watermark — Spark rejects that and fails the query.
            // Clamping to watermark+1 closes such a session on the next
            // watermark advance instead of crashing.
            state.setTimeoutTimestamp(math.max(
              s.last + gapSeconds * 1000L, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
