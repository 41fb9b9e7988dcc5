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

  test("kmv_kmin keeps the k smallest DISTINCT values through real " +
    "partial/merge aggregation (r7)") {
    val vals = Seq(50L, 10L, 30L, 10L, 20L, 40L, 30L, 5L, 60L, 20L)
    val got = vals.toDF("h").repartition(5)
      .agg(sketchNative.kmv_kmin(col("h"), 4).as("m"))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(5L, 10L, 20L, 30L)) // sorted, deduped, k=4
  }

  test("kmv_kmin returns everything when distinct < k, and is " +
    "partitioning-invariant") {
    val vals = Seq(9L, 3L, 7L, 3L, 9L)
    val r1 = vals.toDF("h").repartition(1)
      .agg(sketchNative.kmv_kmin(col("h"), 64).as("m"))
      .collect()(0).getSeq[Long](0)
    val r7 = vals.toDF("h").repartition(7)
      .agg(sketchNative.kmv_kmin(col("h"), 64).as("m"))
      .collect()(0).getSeq[Long](0)
    assert(r1 == Seq(3L, 7L, 9L) && r7 == r1)
  }

  test("kmv estimator lands near the true cardinality on hashed ids") {
    // 5000 distinct ids hashed through the portable h48; k=64 gives
    // ~1/sqrt(62) ≈ 13% rse — assert a generous 3-sigma envelope
    val n = 5000
    val df = (1 to n).map(_.toString).toDF("s")
      .select(graft.functions.PortableHash.h48(col("s")).as("h"))
      .repartition(9)
    val mins = df.agg(sketchNative.kmv_kmin(col("h"), 64).as("m"))
      .collect()(0).getSeq[Long](0)
    assert(mins.length == 64)
    val est = 63L * 281474976710656L / mins.last
    assert(est > n * 0.6 && est < n * 1.4, s"est $est vs true $n")
  }

  test("kmv overlap: sketch-only set algebra is EXACT when the " +
    "sketches hold the complete sets (sf0.001: 15 users/type)") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.relational.RelQueries.kmvOverlap(spark, sf).collect()
    assert(got.length == 10) // C(5,2) type pairs
    val sets = graft.relational.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getLong(1)).toSet }
    got.foreach { r =>
      val sa = sets(r.getString(0)); val sb = sets(r.getString(1))
      assert(r.getLong(3) == (sa | sb).size.toLong,
        s"est_union ${r.getString(0)}/${r.getString(1)}")
      assert(r.getLong(5) == (sa & sb).size.toLong,
        s"est_intersection ${r.getString(0)}/${r.getString(1)}")
    }
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
