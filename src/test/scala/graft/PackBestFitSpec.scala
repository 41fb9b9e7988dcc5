package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Assembly
import graft.relational.Tables

/** r11 (VERDICT r10 #4): the no-split FFD packing report. The oracle
  * replays doc-by-doc first-fit-decreasing; the operator simulates it
  * batched over (remaining, count) bin RUNS. These specs pin the
  * equivalence of the two formulations directly (property-tested
  * against a naive reference FFD over random size multisets) plus the
  * report's arithmetic invariants on the driver corpus. */
class PackBestFitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Naive reference: doc-by-doc FFD, bins as a growing array —
    * exactly the oracle's recursive-CTE algorithm. */
  private def naiveFfd(sizes: Seq[Long], c: Long): (Long, Long, Long) = {
    val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
    sizes.sorted(Ordering[Long].reverse).foreach { s =>
      bins.indexWhere(_ >= s) match {
        case -1 => bins += c - s
        case i  => bins(i) -= s
      }
    }
    (bins.length.toLong, bins.sum, if (bins.isEmpty) 0L else bins.max)
  }

  /** Drive the OPERATOR's run-batched simulation through a tiny
    * docs frame whose texts have the given token counts. */
  private def batched(sizes: Seq[Long], c: Long): (Long, Long, Long) = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = sizes.zipWithIndex
      .map { case (n, i) => (i.toLong, Seq.fill(n.toInt)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val r = Assembly.packBestFit(docs, c)
      .where(col("method") === "bestfit_ffd").head()
    (r.getLong(4), r.getLong(5), r.getLong(7))
  }

  test("run-batched FFD == doc-by-doc FFD on random size multisets") {
    val rnd = new Random(47) // fixed seed — deterministic CI
    (1 to 25).foreach { _ =>
      val sizes = Seq.fill(rnd.nextInt(60))(1L + rnd.nextInt(64))
      assert(batched(sizes, 64L) == naiveFfd(sizes, 64L), sizes.take(8))
    }
  }

  test("adversarial shapes: ties, exact fits, one-giant, all-equal") {
    val cases = Seq(
      Seq.fill(10)(32L),                   // exact halves
      Seq.fill(7)(64L),                    // exact fulls
      Seq(63L, 1L, 63L, 1L, 62L, 2L),      // perfect complements
      Seq(40L, 40L, 40L, 24L, 24L, 24L),   // partial-run split
      Seq(1L), Seq(64L),
      (1L to 64L),                         // every size once
      Seq.fill(30)(21L))                   // 3 per bin with pad 1
    cases.foreach { sizes =>
      assert(batched(sizes, 64L) == naiveFfd(sizes, 64L), sizes.take(8))
    }
  }

  test("report invariants on the driver corpus: FFD is never below " +
    "the stream bound and pad accounting is exact") {
    val r = Assembly
      .packBestFit(Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(r.map(_.getString(0)).toSeq == Seq("bestfit_ffd", "stream_split"))
    val Array(ffd, stream) = r
    val c = ffd.getLong(1)
    // same corpus totals on both rows
    assert(ffd.getLong(2) == stream.getLong(2))
    assert(ffd.getLong(3) == stream.getLong(3))
    // stream is the ⌈T/C⌉ lower bound; FFD can only match or exceed
    assert(stream.getLong(4) == (stream.getLong(3) + c - 1) / c)
    assert(ffd.getLong(4) >= stream.getLong(4))
    // pad = allocated − used, exactly, on both rows
    Seq(ffd, stream).foreach { row =>
      assert(row.getLong(5) == row.getLong(4) * c - row.getLong(3))
      assert(row.getLong(6) ==
        (if (row.getLong(4) == 0) 0L
         else 1000000L * row.getLong(5) / (row.getLong(4) * c)))
      assert(row.getLong(7) <= row.getLong(5))
    }
  }

  test("oversize docs split into zero-pad full shards plus a remainder item") {
    // 2.5 shards of tokens in one doc + one small doc: 2 full shards
    // + FFD packs the 32-token remainder with the 30-token doc
    val got = batched(Seq.empty, 64L) // empty corpus: zero shards
    assert(got == ((0L, 0L, 0L)))
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (0L, Seq.fill(160)("w").mkString(" ")),  // 2×64 + 32
      (1L, Seq.fill(30)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Assembly.packBestFit(docs, 64L)
      .where(col("method") === "bestfit_ffd").head()
    assert(r.getLong(4) == 3L, "2 full + 1 shared shard")
    assert(r.getLong(5) == 3L * 64L - 190L)
  }
}
