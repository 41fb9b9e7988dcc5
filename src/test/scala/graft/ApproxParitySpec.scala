package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.relational.{RelQueries, Tables}

/** Accuracy contracts for the engine-specific sketch queries (the x_
  * rows-only surface): the driver can only check their shape, so the
  * error bound each sketch advertises is asserted here against the
  * exact twin on the same corpus.
  *
  *  - x_median_approx (GK sketch, accuracy 10000): rank error is at
  *    most n/10000, so the approx median must lie inside the exact
  *    [p49, p51] value envelope — a rank-based tolerance, matching
  *    the sketch's own guarantee rather than an ad-hoc value epsilon.
  *  - x_approx_users (HLL++, default rsd 5%): relative error vs the
  *    exact distinct count within 3×rsd. HLL is deterministic for a
  *    given input, so this is a stable assertion, not a flaky one.
  */
class ApproxParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("x_median_approx lies inside the exact [p49, p51] envelope per type") {
    val envelope = Tables.events(spark, sfDir)
      .select(col("event_type"),
        floor(col("value") * 100).cast("long").as("value_c"))
      .groupBy("event_type")
      .agg(expr("percentile(value_c, array(0.49D, 0.51D))").as("env"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val approx = RelQueries.medianValueApproxByType(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(approx.nonEmpty)
    approx.foreach { case (tpe, medApprox) =>
      val Seq(lo, hi) = envelope(tpe).toSeq
      assert(medApprox >= lo - 1 && medApprox <= hi + 1,
        s"$tpe: approx median $medApprox outside [$lo, $hi]")
    }
  }

  test("x_winsorize_approx: counts match the exact anchor and the " +
    "approx bounds sit inside GK rank-error envelopes (r7)") {
    val exact = RelQueries.winsorize(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = RelQueries.winsorizeApprox(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(approx.nonEmpty && approx.keySet == exact.keySet)
    // rank-error envelope: GK at accuracy 10000 is within n/10000
    // ranks, so the approx p5/p95 bound lies inside the exact
    // [p4, p6] / [p94, p96] value envelope per type
    val env = Tables.events(spark, sfDir)
      .select(col("event_type"),
        floor(col("value") * 100).cast("long").as("v_c"))
      .groupBy("event_type")
      .agg(expr(
        "percentile(v_c, array(0.04D, 0.06D, 0.94D, 0.96D))").as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    approx.foreach { case (tpe, a) =>
      assert(a.getLong(1) == exact(tpe).getLong(1), s"$tpe: n differs")
      val Seq(p4, p6, p94, p96) = env(tpe).toSeq
      // clip counts bounded by the envelope's implied rank windows:
      // approx clip fractions must stay near 5% (within [4%, 6%] + 1)
      val n = a.getLong(1).toDouble
      assert(a.getLong(2) / n <= 0.061 && a.getLong(3) / n <= 0.061,
        s"$tpe: clip fractions ${a.getLong(2) / n} / ${a.getLong(3) / n}")
      // winsorized sum within the worst-case bound-shift envelope
      val exS = exact(tpe).getLong(4).toDouble
      val gotS = a.getLong(4).toDouble
      val slack = n * (math.abs(p6 - p4) + math.abs(p96 - p94) + 2)
      assert(math.abs(gotS - exS) <= slack,
        s"$tpe: winsorized sum $gotS vs $exS beyond $slack")
    }
  }

  test("x_approx_users within 3x the advertised HLL rsd of the exact count") {
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id").as("approx_users"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(approx.nonEmpty)
    approx.foreach { case (tpe, got) =>
      val ex = exact(tpe).toDouble
      assert(math.abs(got - ex) / ex <= 0.15,
        s"$tpe: approx $got vs exact $ex beyond 15%")
    }
  }
}
