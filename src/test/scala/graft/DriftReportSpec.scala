package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Laws of the r11 embedding drift report: per-label centroid cosine
  * between vec_id-parity halves, integer floor-mean centroids. The
  * floor-pin case exists because the centroid mean uses floor of the
  * IEEE quotient — integer `div` (truncation) would differ on
  * negative component sums and silently diverge from the oracle. */
class DriftReportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("identical halves drift 1e6; orthogonal halves drift 0") {
    // [1,0]: norm^2 = 1024^2 is a perfect square, so the shared IEEE
    // sqrt is exact and identical halves land on exactly 1e6 (a
    // non-square norm floors to 999999 on BOTH engines — the formula
    // is shared, so either value is deterministic; the spec pins the
    // exact-sqrt case)
    val d = emb(
      (2L, Seq(1.0f, 0.0f), 1), (3L, Seq(1.0f, 0.0f), 1),
      (4L, Seq(1.0f, 0.0f), 0), (5L, Seq(0.0f, 1.0f), 0))
    val m = Similarity.driftReport(d).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(m(1) == 1000000L)
    assert(m(0) == 0L)
  }

  test("negative component sums floor (not truncate) in the centroid") {
    // even half: qe dim0 = floor(-0.001*1024) + floor(0.001*1024)
    //          = -2 + 1 = -1; mean = floor(-1/2) = -1 (trunc: 0).
    // centroid (-1, 1024) vs odd half (0, 1024):
    // cos = 1024 / sqrt(1 + 1024^2) -> ppm floor = 999999; a
    // truncating mean would give exactly 1000000.
    val d = emb(
      (6L, Seq(-0.001f, 1.0f), 2), (8L, Seq(0.001f, 1.0f), 2),
      (7L, Seq(0.0f, 1.0f), 2))
    val r = Similarity.driftReport(d).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 2L && r.head.getLong(2) == 1L)
    assert(r.head.getLong(3) == 999999L)
  }

  test("zero-direction centroid halves are excluded, not NaN-hashed") {
    // label 3's odd half ([0.5,0] + [-0.5,0]) floor-means to the
    // zero vector (each vector individually passes the qn>0 gate) ->
    // the label has no drift direction and must be absent
    val d = emb(
      (10L, Seq(1.0f, 0.0f), 3), (11L, Seq(0.5f, 0.0f), 3),
      (15L, Seq(-0.5f, 0.0f), 3),
      (12L, Seq(1.0f, 0.0f), 4), (13L, Seq(1.0f, 0.0f), 4))
    val rows = Similarity.driftReport(d).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(4))
  }
}
