package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.EventSemantics

/** Continuously-maintained activity rollup (SURVEY §2 #93): the
  * reference's `mv_user_monthly_activity` kept fresh AT INGEST instead of
  * by the monthly refresh procedure — the same aggregation as the batch
  * rollup ([[EventSemantics.userWeeklyActivity]]) running as a streaming
  * aggregation. Between the batch refresh (`incrementRollup`, #68) and
  * this, both maintenance disciplines the reference supports are covered.
  *
  * State = one count per (user, channel, week) — the MV's own cardinality,
  * independent of event volume. The streaming group key is a
  * `window(ts, "7 days")` tumbling window (Monday-aligned via startTime:
  * the epoch is a Thursday, so "4 days" shifts boundaries onto Mondays —
  * exactly `date_trunc('week')`'s weeks): unlike a derived
  * `to_date(date_trunc(...))` column, the window key CARRIES the
  * event-time watermark metadata, so in update/append mode Spark evicts
  * closed-week state and drops late rows behind the watermark — only live
  * weeks stay in state. (In complete mode, eviction is moot by
  * definition.) `RollupStreamSpec` proves a second micro-batch INCREMENTS
  * the first batch's counts, and that a row behind the watermark no
  * longer mutates the MV.
  */
object RollupStream {

  /** The maintained rollup over a batch OR streaming `events` frame —
    * identical output schema and values in both modes; in streaming, the
    * watermark is attached first and the week is keyed by an event-time
    * window so closed-week state is droppable.
    */
  def maintained(events: DataFrame, watermark: Option[String] = Some("14 days")): DataFrame =
    if (events.isStreaming) {
      EventSemantics.requireUtcSession(events, "RollupStream.maintained")
      val src = watermark.fold(events)(events.withWatermark("ts", _))
      src
        .filter(!EventSemantics.isGift)
        .groupBy(col("user_id"), EventSemantics.channel,
          // Monday-aligned tumbling week == date_trunc('week', ts)
          window(col("ts"), "7 days", "7 days", "4 days").as("wk"))
        .agg(count(lit(1)).as("messages"))
        .select(col("user_id"), col("channel"),
          to_date(col("wk.start")).as("week"), col("messages"))
    } else EventSemantics.userWeeklyActivity(events)
}
