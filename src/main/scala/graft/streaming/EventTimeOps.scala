package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time operators for streams shaped like the `events` table
  * (`ts: timestamp, user_id: bigint, event_type: string,
  * value: double`). All are standard Structured Streaming
  * constructs — watermark + windowed aggregation — and run unchanged
  * in batch mode (window() is an ordinary grouping expression), which
  * is how the specs assert exact values.
  *
  * Scale notes: streaming state for a windowed aggregation is
  * (window × group) — bounded by the watermark horizon; the shuffle
  * key includes the window so state is evenly spread unless
  * event_type is skewed (then salt the group key). The watermark
  * bounds both state size and late-data acceptance, mirroring how
  * the reference bounds nothing (it is stateless; SURVEY.md §2.2 —
  * these operators are extension surface).
  */
object EventTimeOps {

  /** Tumbling event-time window rollup with watermark: per (window,
    * event_type) counts and cent-quantized value sums. */
  def tumblingRollup(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value_c"))

  /** Sliding-window variant (windowLen every slide). */
  def slidingRollup(events: DataFrame, windowLen: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n"))

  /** Built-in session windows: per-user sessions closed after `gap`
    * of event-time inactivity. */
  def sessionRollup(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
}
