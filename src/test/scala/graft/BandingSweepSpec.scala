package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Laws of the r11 banding sweep and filtered-ANN additions. */
class BandingSweepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("web"))

  test("bands sweep: arms are NESTED — candidates and dups " +
    "non-decreasing in b, s* strictly decreasing") {
    // contiguous halving makes each arm's candidate set a superset of
    // the previous: agreeing on all 16 slots implies agreeing on one
    // 8-slot band, which implies one 4-slot band, and so on.
    val d = docs(
      1L -> "a b c d e f g h", 2L -> "a b c d e f g h",  // identical
      3L -> "a b c d e f g x", 4L -> "q r s t u v w z",
      5L -> "a b c d q r s t")
    val rows = Dedup.minhashBandsSweep(d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted.reverse) // s* desc
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted)         // cands asc
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted)         // dups asc
    // the identical pair is found by EVERY arm including the
    // strictest (full-signature bucket)
    assert(rows.head._3 >= 1L)
    // analytic thresholds at the endpoints: (1/1)^(1/16)=1,
    // (1/16)^(1/1)=0.0625
    assert(rows.head._2 == 1000000L && rows.last._2 == 62500L)
  }

  test("knn upsert: incremental merge equals the from-scratch graph, " +
    "including displaced neighbors and rank values") {
    // all-positive dims -> every vector lands in one band bucket, so
    // candidates are all pairs and displacement is exercised: new
    // vec 10 sits between 1 and 3, pushing 3 down id 1's list; new
    // vec 20 is near-orthogonal noise.
    val emb = Seq(
      (1L, Seq(1.0f, 0.1f)), (3L, Seq(0.8f, 0.3f)), (5L, Seq(0.1f, 1.0f)),
      (10L, Seq(0.95f, 0.15f)), (20L, Seq(0.3f, 0.9f)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val inc = rows(Similarity.knnGraphUpsertWith(emb, 2,
      e => graft.operators.Dedup.vectorBands(e, 1, 2), 10))
    val scratch = rows(Similarity.knnGraph(emb, k = 2, nBands = 1,
      bitsPerBand = 2))
    assert(inc == scratch)
    // the displacement really happened: vec 10 is id 1's rank-1
    assert(inc.contains((1L, 1L, 10L, inc.find(t => t._1 == 1L &&
      t._2 == 1L).get._4)))
  }

  test("knn upsert: empty incoming batch returns the stored graph unchanged") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.1f)), (3L, Seq(0.8f, 0.3f)), (5L, Seq(0.1f, 1.0f)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows(Similarity.knnGraphUpsertWith(emb, 2,
        e => graft.operators.Dedup.vectorBands(e, 1, 2), 10)) ==
      rows(Similarity.knnGraph(emb, k = 2, nBands = 1, bitsPerBand = 2)))
  }

  test("filtered ANN: post arm is the label-filtered subset of the " +
    "global top-k with ranks preserved; pre ranks are <= post ranks") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 1),   // query, label 1
      (2L, Seq(0.9f, 0.1f), 1),   // close, same label
      (3L, Seq(0.95f, 0.05f), 2), // closer, OTHER label
      (4L, Seq(0.8f, 0.2f), 1),
      (5L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnFiltered(emb, nQueries = 1, k = 2).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val pre = out.filter(_._1 == "pre").map(t => (t._2, t._3))
    val post = out.filter(_._1 == "post").map(t => (t._2, t._3))
    // global order from query 0: 3 (other label), 2, 4, 5
    // post top-2 = {3, 2} filtered to label 1 -> only (rank 2, vec 2):
    // the GAP at rank 1 is the post-filter recall loss, visible
    assert(post == Seq((2L, 2L)))
    // pre ranks within the stratum: 2 then 4
    assert(pre == Seq((1L, 2L), (2L, 4L)))
  }
}
