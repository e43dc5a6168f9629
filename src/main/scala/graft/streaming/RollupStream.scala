package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.EventSemantics

/** Continuously-maintained activity rollup (SURVEY §2 #93): the
  * reference's `mv_user_monthly_activity` kept fresh AT INGEST instead of
  * by the monthly refresh procedure — the identical declarative
  * aggregation as the batch rollup ([[EventSemantics.userWeeklyActivity]])
  * running as a streaming aggregation. Between the batch refresh
  * (`incrementRollup`, #68) and this, both maintenance disciplines the
  * reference supports are covered.
  *
  * State = one count per (user, channel, week) — the MV's own cardinality,
  * independent of event volume; with a watermark only live weeks stay in
  * state (closed weeks are final and evictable). `RollupStreamSpec` proves
  * a second micro-batch INCREMENTS the first batch's counts rather than
  * restarting them.
  */
object RollupStream {

  /** The maintained rollup over a batch OR streaming `events` frame — the
    * same plan in both modes; in streaming, attach the watermark first so
    * state for closed weeks can be dropped.
    */
  def maintained(events: DataFrame, watermark: Option[String] = Some("14 days")): DataFrame = {
    val src = if (events.isStreaming)
      watermark.fold(events)(events.withWatermark("ts", _))
    else events
    EventSemantics.userWeeklyActivity(src)
  }
}
