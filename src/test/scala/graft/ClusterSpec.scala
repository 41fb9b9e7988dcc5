package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cluster
import graft.relational.Tables

/** Cluster.kmeansAssign / semDedup vs a complete brute-force JVM
  * Lloyd implementation on the real corpus — every step (quantize,
  * seed, argmin tiebreak, floor-mean update, final assign, within-
  * cluster cosine dedup) re-derived independently. */
class ClusterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val K = 8
  private val Iters = 2
  private val Thr = 450000L

  private lazy val vecs: Seq[(Long, Array[Long])] =
    Tables.embeddings(spark, sf).collect().map { r =>
      val q = r.getSeq[Float](r.fieldIndex("embedding"))
        .map(x => math.floor(x.toDouble * 1024).toLong).toArray
      (r.getLong(r.fieldIndex("vec_id")), q)
    }.toSeq.filter { case (_, q) => q.map(x => x * x).sum > 0 }
      .sortBy(_._1)

  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  /** Brute-force Lloyd: returns (assignment, final centroids). */
  private lazy val reference: Map[Long, Long] = {
    var cents: Seq[(Long, Array[Long])] =
      vecs.filter(_._1 < K).map { case (id, q) => (id, q) }
    def assign(): Map[Long, Long] = vecs.map { case (id, q) =>
      val n = dot(q, q)
      val best = cents.map { case (cid, ce) =>
        (n + dot(ce, ce) - 2 * dot(q, ce), cid)
      }.min
      id -> best._2
    }.toMap
    for (_ <- 1 to Iters) {
      val a = assign()
      val byC = vecs.groupBy { case (id, _) => a(id) }
      cents = cents.map { case (cid, old) =>
        byC.get(cid) match {
          case Some(members) =>
            val d = members.head._2.length
            val ce = (0 until d).map { p =>
              val s = members.map(_._2(p)).sum
              math.floor(s.toDouble / members.size).toLong
            }.toArray
            (cid, ce)
          case None => (cid, old)
        }
      }
    }
    assign()
  }

  test("kmeansAssign equals the brute-force Lloyd reference") {
    val got = Cluster.kmeansAssign(Tables.embeddings(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference)
    // clustering is non-trivial: more than one cluster is populated
    assert(got.values.toSet.size > 1)
  }

  test("semDedupAuto applies the √N scaling rule and spreads clusters") {
    val out = Cluster.semDedupAuto(Tables.embeddings(spark, sf)).collect()
    assert(out.length == vecs.size)
    // k = max(8, √500) = 22 seeds; a healthy fraction is populated
    val nClusters = out.map(_.getLong(1)).distinct.length
    assert(nClusters > 8, s"expected >8 populated clusters, got $nClusters")
  }

  test("native-codebook argmin path == literal path (kmeans, semdedup_auto, ivfpq)") {
    // The default is the native CentroidArgmin reference-object form
    // (r16 — see Cluster.LiteralArgminMaxK); passing the ceiling as
    // literalArgminMaxK forces the k-plan-literal `least()` form at
    // small k, pinning bit-parity of the two assign/encode
    // implementations on the real corpus.
    val lit = Cluster.LiteralArgminMaxK
    val emb = Tables.embeddings(spark, sf)
    assert(Cluster.kmeansAssign(emb).collect().toSeq ==
      Cluster.kmeansAssign(emb, literalArgminMaxK = lit).collect().toSeq)
    assert(Cluster.semDedupAuto(emb).collect().toSeq ==
      Cluster.semDedupAuto(emb, literalArgminMaxK = lit).collect().toSeq)
    assert(graft.operators.Similarity.knnIvfPq(emb).collect().toSeq ==
      graft.operators.Similarity.knnIvfPq(emb, literalArgminMaxK = lit)
        .collect().toSeq)
    assert(graft.operators.Similarity.knnIvfPqTrained(emb).collect().toSeq ==
      graft.operators.Similarity.knnIvfPqTrained(emb, literalArgminMaxK = lit)
        .collect().toSeq)
  }

  test("semDedup drops exactly the within-cluster higher-id near-dups") {
    val losers = (for {
      (a, qa) <- vecs; (b, qb) <- vecs
      if a < b && reference(a) == reference(b)
      na = dot(qa, qa); nb = dot(qb, qb)
      cos = math.floor(1000000.0 * dot(qa, qb)
        / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))).toLong
      if cos >= Thr
    } yield b).toSet
    val got = Cluster.semDedup(Tables.embeddings(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (id, cid, kept) =>
      assert(cid == reference(id), s"vec $id in wrong cluster")
      assert(kept == (if (losers(id)) 0L else 1L), s"vec $id kept flag")
    }
    assert(losers.nonEmpty, "corpus plants at least one semantic dup")
  }

  test("clusterSample (r13): per-cell counts = min(n, |cell|), picks " +
    "dense per cell, every cell represented, and the sample is " +
    "rerun-stable") {
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, sf)
    val sample = Cluster.clusterSample(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cellSizes = Cluster.kmeansAssign(e).collect()
      .map(_.getLong(1)).groupBy(identity).view.mapValues(_.length).toMap
    val byCell = sample.groupBy(_._2)
    // every learned cell contributes, capped at 20 picks
    assert(byCell.keySet == cellSizes.keySet)
    byCell.foreach { case (cid, rows) =>
      assert(rows.length == math.min(20, cellSizes(cid)),
        s"cell $cid: ${rows.length} of ${cellSizes(cid)}")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"cell $cid picks not dense")
    }
    // deterministic: a second run is byte-identical (the salted-hash
    // order is the rerun-stable replacement for a rand() reservoir)
    val again = Cluster.clusterSample(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sample.toSeq == again.toSeq)
  }
}
