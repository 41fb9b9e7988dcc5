package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded event-time range join: for each purchase, aggregate the
  * same user's clicks inside the lookback window (p_ts − W, p_ts] —
  * the feature-engineering primitive behind "activity in the last
  * hour before conversion".
  *
  * Scale design: the naive formulation is an equi-join on user with a
  * residual time predicate — at 100 TB a hot user makes that per-user
  * pair set quadratic. The BUCKETED form bins click time into
  * window-sized buckets and has each purchase probe exactly its own
  * and the previous bucket (two bins cover any W-length lookback), so
  * the join key becomes (user, bin): fan-out per probe is bounded by
  * the user's activity in ≤ 2W of wall time, not their whole history.
  * Same trick range-join optimizers (e.g. Databricks' binned range
  * join) apply declaratively; here it is explicit and portable.
  */
object RangeJoin {

  /** Clicks in the lookback window per purchase (left-complete: a
    * purchase with no clicks reports n_clicks = 0). */
  def clicksBefore(events: DataFrame,
                   windowUs: Long = 3600L * 1000000L): DataFrame = {
    val e = events.select(col("event_type"), col("user_id"), col("event_id"),
      expr("CAST(ts AS BIGINT) div 1000").as("us"))
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id"), col("us").as("c_us"),
        expr(s"us div $windowUs").as("bin"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("us").as("purchase_us"),
        expr(s"us div $windowUs").as("pbin"))
    val probes = purchases.select(col("user_id"), col("purchase_id"),
      col("purchase_us"), explode(array(col("pbin") - 1, col("pbin"))).as("bin"))
    probes.join(clicks, Seq("user_id", "bin"), "left")
      .groupBy("purchase_id", "user_id", "purchase_us")
      .agg(sum(when(col("c_us") > col("purchase_us") - windowUs
          && col("c_us") <= col("purchase_us"), 1L).otherwise(0L))
        .as("n_clicks"))
      .select("purchase_id", "user_id", "purchase_us", "n_clicks")
      .orderBy("purchase_id")
  }

  /** Naive theta formulation (equi on user + residual range filter) —
    * the executable specification [[clicksBefore]] is asserted equal
    * to (RangeJoinSpec). */
  def clicksBeforeNaive(events: DataFrame,
                        windowUs: Long = 3600L * 1000000L): DataFrame = {
    val e = events.select(col("event_type"), col("user_id"), col("event_id"),
      expr("CAST(ts AS BIGINT) div 1000").as("us"))
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("us").as("c_us"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("us").as("purchase_us"))
    purchases.join(clicks,
        col("user_id") === col("c_user")
          && col("c_us") > col("purchase_us") - windowUs
          && col("c_us") <= col("purchase_us"), "left")
      .groupBy("purchase_id", "user_id", "purchase_us")
      .agg(sum(when(col("c_us").isNotNull, 1L).otherwise(0L)).as("n_clicks"))
      .select("purchase_id", "user_id", "purchase_us", "n_clicks")
      .orderBy("purchase_id")
  }
}
