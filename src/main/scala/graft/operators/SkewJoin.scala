package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join split handles most skew at runtime, but it only
  * splits partitions AFTER a sort-merge join is chosen and cannot
  * help a broadcast-ineligible dimension side with one giant hot
  * key. The classic manual remedy: replicate the (smaller) build
  * side `saltFactor` times and scatter the probe side by a
  * DETERMINISTIC salt (hash of the whole probe row, not rand() —
  * retried tasks must salt identically or rows are lost/duplicated
  * at-least-once), turning one hot key into `saltFactor` cells.
  *
  * Semantics: exactly a plain inner equi-join on `key` (asserted by
  * the spec on skewed data). Cost: |right| × saltFactor replication
  * — use only when the hot side is orders of magnitude hotter.
  */
object SkewJoin {

  def saltedInner(probe: DataFrame, build: DataFrame, key: String,
                  saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1)
    val salted = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col): _*), lit(saltFactor)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
