package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state.
  *
  * Both sides are watermarked and the join carries an explicit
  * event-time range condition — that pair is what lets Structured
  * Streaming EVICT buffered rows: without the time bound, both
  * sides' state grows forever. State size ≈ (rows within the
  * watermark horizon) per side, shuffled by the join key.
  */
object StreamJoins {

  /** Attribution-style inner join: every purchase joined to the same
    * user's clicks that happened in the `horizon` BEFORE it.
    * Expects both frames shaped (user_id, ts: timestamp, event_id).
    * Works identically in batch mode (used for exact-value specs). */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       horizon: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")
  }
}
