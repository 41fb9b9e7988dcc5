package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the "what is in this lake" pass that
  * precedes every large-scale curation job: per column, row count,
  * non-null count, and exact distinct cardinality, in long format so
  * downstream checks (null-rate gates, key-uniqueness assertions) are
  * plain filters over the profile.
  *
  * Scale design: ONE scan. All per-column counts fold into a single
  * aggregate; the multiple exact COUNT(DISTINCT) rewrite to one
  * Expand + two-phase aggregate (Spark's standard multi-distinct
  * plan), which is a k-fold row expansion but still a single pass
  * over the data with map-side partials — the structure a 100 TB
  * profile needs (per-column separate scans would read the lake k
  * times). For cardinality-only monitoring at scale, swap
  * countDistinct for approx_count_distinct (HLL, no Expand) — exact
  * is declared here because the oracle must pin exact values.
  */
object Profile {

  /** (col_name, n_rows, n_nonnull, n_distinct) per profiled column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${cols.size}, $rows) AS (col_name, n_nonnull, n_distinct)")
      .select("col_name", "n_rows", "n_nonnull", "n_distinct")
      .orderBy("col_name")
  }
}
