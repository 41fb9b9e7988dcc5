package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    // Measured and deliberately NOT spread (r16): the Expand's
    // partial phase runs 3-way here (row-group-split-bound), but a
    // round-robin spread first COSTS more than it parallelizes —
    // 1.35 → 1.69 s at sf0.1 — because the partial multi-distinct
    // aggregate riding the pruned vectorized scan is far cheaper per
    // row than the same partials over shuffled rows (plus the
    // keyless repartition's sort-before-repartition pass). At scale
    // the scan has real splits and the question disappears.
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${cols.size}, $rows) AS (col_name, n_nonnull, n_distinct)")
      .select("col_name", "n_rows", "n_nonnull", "n_distinct")
      .orderBy("col_name")
  }

  /** Declarative data-quality expectations (r5 — the Deequ-style
    * validation pass run before admitting a partition to the lake):
    * each check is a named boolean predicate; the report is
    * (check_name, n_rows, n_violations, pass) per check.
    *
    * Scale design: ONE scan, ONE aggregate — every check folds into a
    * conditional sum in the same partial-combinable aggregate (k
    * checks cost k counters per partition, not k passes over 100 TB);
    * the stack to long format runs over the single aggregated row.
    * Checks are (name, violated-when) pairs so callers declare
    * constraints next to ingestion code. */
  def expectations(df: DataFrame,
                   checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "zero expectations")
    // names are interpolated into the stack() selectExpr below (and
    // become v_<name> columns), so they must be bare identifiers — a
    // quote/space/metachar would break analysis or splice SQL
    checks.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+"),
        s"expectation name '$name' must match [A-Za-z0-9_]+ " +
          "(it is spliced into a stack() expression and a v_<name> column)")
    }
    val aggs = count(lit(1)).as("n_rows") +: checks.map { case (name, bad) =>
      sum(when(bad, 1L).otherwise(0L)).as(s"v_$name")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.map { case (n, _) => s"'$n', v_$n" }.mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${checks.size}, $rows) AS (check_name, n_violations)")
      .select(col("check_name"), col("n_rows"), col("n_violations"),
        when(col("n_violations") === 0L, 1L).otherwise(0L).as("pass"))
      .orderBy("check_name")
  }
}
