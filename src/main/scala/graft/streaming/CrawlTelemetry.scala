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
}
