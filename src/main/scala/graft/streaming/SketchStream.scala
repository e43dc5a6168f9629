package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.EventSemantics

/** Streaming maintenance of the HLL sketch MV (the interactive overlap
  * layer's stored relation, `ChatStats.sketchRollup`) — the CONTINUOUS
  * variant of `RollupWarehouse.refreshSketches`: the sketch aggregate runs
  * as a streaming aggregation, so every micro-batch folds its users into
  * the per-(channel, week) sketch state instead of a scheduled job
  * re-merging a delta.
  *
  * State = one HLL buffer (~10 KB at lgConfigK 14) per (channel, week) —
  * the MV's own cardinality, independent of event volume. The week key is
  * the Monday-aligned event-time window (same construction as
  * [[RollupStream]]), so it carries the watermark metadata and closed
  * weeks evict. `SketchStreamSpec` proves the streamed estimates equal the
  * batch-built sketch rollup's and that they keep incrementing across
  * micro-batches.
  */
object SketchStream {

  /** Per (channel, Monday week) HLL user sketch over a batch OR streaming
    * frame, emitted as (channel, week, approx_users) estimates.
    */
  def maintained(events: DataFrame, lgConfigK: Int = 14,
                 watermark: Option[String] = Some("14 days")): DataFrame =
    if (events.isStreaming) {
      EventSemantics.requireUtcSession(events, "SketchStream.maintained")
      val src = watermark.fold(events)(events.withWatermark("ts", _))
      src
        .filter(!EventSemantics.isGift)
        .groupBy(EventSemantics.channel,
          window(col("ts"), "7 days", "7 days", "4 days").as("wk"))
        .agg(hll_sketch_agg(col("user_id"), lit(lgConfigK)).as("sk"))
        .select(col("channel"), to_date(col("wk.start")).as("week"),
          hll_sketch_estimate(col("sk")).as("approx_users"))
    } else
      graft.operators.ChatStats.sketchRollup(events, lgConfigK)
        .select(col("channel"), col("week"),
          hll_sketch_estimate(col("sk")).as("approx_users"))
}
