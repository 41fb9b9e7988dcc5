package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.sketchNative

/** Laws of the Misra–Gries heavy-hitters aggregate: exactness within
  * capacity, the N/(capacity+1) error bound under overflow, presence
  * of every true heavy hitter, and SQL availability — all through
  * real multi-partition aggregation so the partial/merge path is the
  * one exercised. */
class SketchAggregateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def topOf(df: org.apache.spark.sql.DataFrame, cap: Int, k: Int) =
    df.repartition(7)
      .agg(sketchNative.mg_topk(col("w"), cap, k).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.term"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1))

  test("exact counts when the vocabulary fits capacity") {
    val words = (1 to 500).map(i => s"w${i % 17}")
    val df = words.toDF("w")
    val exact = words.groupBy(identity).map { case (w, ws) =>
      w -> ws.size.toLong }
    val got = topOf(df, cap = 64, k = 17).toMap
    assert(got == exact)
  }

  test("overflow: heavy hitters survive with est within the MG bound") {
    // 3000 singleton terms + one term at 500 and one at 200;
    // N = 3700, capacity 16 → bound N/17 ≈ 217.6: the 500-count
    // hitter MUST be present; its estimate within [500-218, 500]
    val stream = (1 to 3000).map(i => s"rare$i") ++
      Seq.fill(500)("heavy") ++ Seq.fill(200)("warm")
    // deterministic interleave so heavy isn't one contiguous run
    val df = new scala.util.Random(42).shuffle(stream).toDF("w")
    val n = stream.size.toLong
    val bound = n / 17
    val got = topOf(df, cap = 16, k = 16).toMap
    assert(got.contains("heavy"), "true heavy hitter evicted")
    assert(got("heavy") <= 500 && got("heavy") >= 500 - bound,
      s"heavy est ${got("heavy")} outside [${500 - bound}, 500]")
    got.foreach { case (_, est) => assert(est <= n) }
  }

  test("mg_topk is usable from spark.sql via the extensions hook") {
    graft.plans.GraftExtensions.register(spark)
    Seq("a", "a", "b", "a", "c").toDF("w").createOrReplaceTempView("mg_in")
    val rows = spark.sql(
      "SELECT explode(mg_topk(w, 8, 2)) AS e FROM mg_in")
      .select("e.term", "e.est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(rows == Seq("a" -> 3L, "b" -> 1L))
  }
}
