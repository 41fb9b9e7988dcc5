package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark's built-ins lack: for every left
  * row, attach the most recent right row with
  * `right.time <= left.time` within the same key.
  *
  * Implementation is the scalable union+carry formulation, NOT a
  * range cross-join: both sides are tagged and unioned, shuffled
  * ONCE on the key, sorted per partition by (time, right-first), and
  * the right payload is carried forward with
  * last(..., ignoreNulls) over rows(-∞, current). Cost is one
  * shuffle + one per-partition sort — immune to the O(|L|·|R|)
  * blowup a naive time-range join has at 100 TB. Right-before-left
  * ordering on time ties gives the inclusive (>=) semantics of
  * DuckDB/kdb ASOF JOIN.
  */
object AsOfJoin {

  /** Inner as-of join. Output columns: key, `l_<time>`, `l_<c>` for
    * each left payload column, `r_<c>` for each right payload column
    * (from the matched most-recent right row).
    *
    * `tieBreak` (r7): a right-side column that totalizes the order
    * among right rows CARRYING THE SAME time — without it, which of
    * several equal-time right rows wins is whatever the sort
    * happened to leave last (probe-sf1's duplicated-timestamp corpus
    * exposed exactly this). With tieBreak = Some(c), the matched row
    * is deterministically the one with MAX c among the tied latest;
    * left rows sort after all tied right rows either way (inclusive
    * >= semantics preserved). */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
           leftCols: Seq[String], rightCols: Seq[String],
           tieBreak: Option[String] = None): DataFrame = {
    val rSide = right.select(
      col(key) +: col(time) +: lit(1).as("is_r") +:
        rightCols.map(c => right(c).as(s"r_$c")): _*)
    val lSide = left.select(
      col(key) +: col(time) +: lit(0).as("is_r") +:
        leftCols.map(c => left(c).as(s"l_$c")): _*)
    // missing columns become typed NULLs on the other side
    val tagged = rSide.unionByName(lSide, allowMissingColumns = true)
      // carry ONE struct (not per-column) so all r_ fields always
      // come from the same right row even if some are NULL there
      .withColumn("r_row", when(col("is_r") === 1,
        struct(rightCols.map(c => col(s"r_$c").as(c)): _*)))
    // left rows have NULL r_ columns, so asc_nulls_last keeps them
    // after every tied right row — the inclusive (>=) semantics —
    // while the tied right rows themselves order by the tiebreaker
    // and last() picks the max deterministically
    val order = Seq(col(time).asc, col("is_r").desc) ++
      tieBreak.map(c => col(s"r_$c").asc_nulls_last)
    val w = Window.partitionBy(key)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof", last(col("r_row"), ignoreNulls = true).over(w))
      .where(col("is_r") === 0 && col("asof").isNotNull)
      .select(col(key) +: col(time).as(s"l_$time") +:
        (leftCols.map(c => col(s"l_$c")) ++
          rightCols.map(c => col(s"asof.$c").as(s"r_$c"))): _*)
  }
}
