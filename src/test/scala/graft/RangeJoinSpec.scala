package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** The bucketed range join must equal both the naive theta-join
  * formulation and a brute-force JVM reference — including the
  * bucket-boundary cases (clicks exactly W before, exactly at, and
  * one µs outside the window). */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val W = 3600L * 1000000L

  /** Random event table in the operator's input shape: ts in NANOS
    * (LongType), like the parquet corpus. */
  private def randomEvents(seed: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new Random(seed)
    val rows = (1 to 400).map { i =>
      val typ = if (rnd.nextBoolean()) "click" else "purchase"
      // cluster timestamps so windows genuinely overlap bin boundaries
      val us = 1000000000000000L + rnd.nextInt(6) * W + rnd.nextInt(3) * (W / 2)
      (typ, rnd.nextInt(5).toLong, i.toLong, us * 1000L)
    }
    // boundary plants: click exactly W before (excluded), exactly at
    // purchase time (included), one µs outside (excluded)
    val p = ("purchase", 99L, 9001L, 2000000000000000L * 1000L)
    val exact = ("click", 99L, 9002L, (2000000000000000L - W) * 1000L)
    val at = ("click", 99L, 9003L, 2000000000000000L * 1000L)
    val outside = ("click", 99L, 9004L, (2000000000000000L - W - 1L) * 1000L)
    (rows ++ Seq(p, exact, at, outside))
      .toDF("event_type", "user_id", "event_id", "ts")
  }

  test("bucketed == naive theta formulation on random events") {
    val e = randomEvents(3)
    val a = RangeJoin.clicksBefore(e).collect().map(_.toSeq).toSeq
    val b = RangeJoin.clicksBeforeNaive(e).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("bucketed matches the brute-force reference; boundaries exact") {
    val e = randomEvents(4)
    val raw = e.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3) / 1000L))
    val clicks = raw.filter(_._1 == "click")
    val expected = raw.filter(_._1 == "purchase").map { case (_, u, id, us) =>
      (id, u, us, clicks.count(c =>
        c._2 == u && c._4 > us - W && c._4 <= us).toLong)
    }.sortBy(_._1).toSeq
    val got = RangeJoin.clicksBefore(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the planted boundary purchase counts exactly the in-window click
    val planted = got.find(_._1 == 9001L).get
    assert(planted._4 == 1L, "only the at-time click is in (t-W, t]")
  }
}
