package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, Dedup}

/** Property tests of the tricky operators against brute-force JVM
  * reference implementations on randomized inputs (fixed seeds —
  * deterministic CI). */
class OperatorPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("applyOrientation: on random rasters every orientation is a " +
    "pixel permutation with correct dims and an exact inverse (r7)") {
    val rnd = new Random(31)
    val inverse = Map(1 -> 1, 2 -> 2, 3 -> 3, 4 -> 4, 5 -> 5,
      6 -> 8, 7 -> 7, 8 -> 6)
    (1 to 50).foreach { _ =>
      val w = 1 + rnd.nextInt(12); val h = 1 + rnd.nextInt(12)
      val src = Array.fill(w * h)(rnd.nextInt(256).toByte)
      (1 to 8).foreach { o =>
        val (out, ow, oh) =
          graft.operators.ImageCodec.applyOrientation(src, w, h, o).get
        assert(ow * oh == w * h)
        assert((ow, oh) == (if (o >= 5) (h, w) else (w, h)))
        assert(out.sorted.toSeq == src.sorted.toSeq, s"o=$o not a permutation")
        val (back, bw, bh) = graft.operators.ImageCodec
          .applyOrientation(out, ow, oh, inverse(o)).get
        assert((bw, bh) == (w, h))
        assert(back.toSeq == src.toSeq, s"inverse(${o}) failed")
      }
    }
  }

  test("asOf equals the brute-force reference on random keyed series") {
    val rnd = new Random(42)
    val left = (1 to 200).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val right = (1 to 200).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, (1000 + i).toLong))
    // reference: for each left row, the right row with max t <= left.t
    // in the same key; ties on right t broken by... our contract takes
    // the LAST right row in (t, insertion) order after sorting -- to
    // keep the property crisp, dedupe right to one row per (k, t)
    // keeping the max id (same as the declared query does upstream).
    val rightDedup = right.groupBy(r => (r._1, r._2)).values
      .map(_.maxBy(_._3)).toSeq
    val expected = left.flatMap { case (k, t, id) =>
      val cands = rightDedup.filter(r => r._1 == k && r._2 <= t)
      if (cands.isEmpty) None
      else {
        val best = cands.maxBy(r => (r._2, r._3))
        Some((k, t, id, best._3))
      }
    }.sorted
    val got = AsOfJoin.asOf(
        left.toDF("k", "t", "lid"), rightDedup.toDF("k", "t", "rid"),
        "k", "t", Seq("lid"), Seq("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(got == expected)
  }

  test("asOf with tieBreak is deterministic on DUPLICATE right " +
    "timestamps — max tiebreak id wins (r7)") {
    val rnd = new Random(17)
    val left = (1 to 150).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(60).toLong, i.toLong))
    // dense duplicate right timestamps: several rows per (k, t)
    val right = (1 to 300).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(60).toLong, (1000 + i).toLong))
    val expected = left.flatMap { case (k, t, id) =>
      val cands = right.filter(r => r._1 == k && r._2 <= t)
      if (cands.isEmpty) None
      else Some((k, t, id, cands.maxBy(r => (r._2, r._3))._3))
    }.sorted
    val got = AsOfJoin.asOf(
        left.toDF("k", "t", "lid"), right.toDF("k", "t", "rid"),
        "k", "t", Seq("lid"), Seq("rid"), tieBreak = Some("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(got == expected)
    // and the result is stable under input shuffling (no residual
    // order sensitivity)
    val shuffled = AsOfJoin.asOf(
        rnd.shuffle(left).toDF("k", "t", "lid"),
        rnd.shuffle(right).toDF("k", "t", "rid"),
        "k", "t", Seq("lid"), Seq("rid"), tieBreak = Some("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(shuffled == expected)
  }

  test("nearDupClusters equals union-find components on the LSH pair graph") {
    // random corpus with planted duplicate groups
    val rnd = new Random(7)
    val vocab = (1 to 40).map(i => s"w$i")
    def doc(): String = (1 to 25).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (1 to 12).map(_ => doc())
    // groups of 3 near-identical docs per base + noise docs
    val texts = bases.zipWithIndex.flatMap { case (b, gi) =>
      Seq(b, b.replace("w1", "xx"), b.replace(s"w${2 + gi % 5}", "yy"))
    } ++ (1 to 20).map(_ => doc())
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val thr = 500000L
    // reference union-find over the SAME pair set the operator uses
    val pairs = Dedup.minhashLsh(docs)
      .where($"est_jaccard_ppm" >= thr).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val expected = texts.indices.map(i => i.toLong -> find(i.toLong)).toMap
    val got = Dedup.nearDupClusters(docs, minEstJaccardPpm = thr).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("groupingSets equals the union of its member groupBy aggregates") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.relational.RelQueries
      .groupingSetsSummary(spark, sf).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    // gid bitmask: both present → 0; status rolled up → 1; all → 3
    assert(rows.filter(_._3 == 0L).forall(r => r._1.isDefined && r._2.isDefined))
    assert(rows.filter(_._3 == 1L).forall(r => r._1.isDefined && r._2.isEmpty))
    val grand = rows.filter(_._3 == 3L)
    assert(grand.length == 1 && grand.head._1.isEmpty)
    // no (status)-only set was produced (the shape cube WOULD add)
    assert(rows.map(_._3).toSet == Set(0L, 1L, 3L))
    // each coarser set sums its finer set exactly
    val fine = rows.filter(_._3 == 0L)
    rows.filter(_._3 == 1L).foreach { case (p, _, _, n, s) =>
      val members = fine.filter(_._1 == p)
      assert(members.map(_._4).sum == n && members.map(_._5).sum == s, s"$p")
    }
    assert(fine.map(_._4).sum == grand.head._4)
    assert(fine.map(_._5).sum == grand.head._5)
  }
}
