package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{VectorOps => V}

/** Native vector expressions vs their HOF executable specs. */
class VectorNativeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vecGen = for {
    n <- Gen.chooseNum(0, 20)
    v <- Gen.listOfN(n, Gen.chooseNum(-8.0f, 8.0f))
  } yield v

  test("native quantize == HOF spec") {
    val vecs = Gen.listOfN(120, vecGen).sample.get
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val got = df.select(col("id"), V.quantize(col("v"))).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = df.select(col("id"), V.quantizeHof(col("v"))).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == want)
  }

  test("native qdot == HOF spec incl. length-mismatch NULL") {
    val pairs = Gen.listOfN(120, Gen.zip(vecGen, vecGen)).sample.get
    val df = pairs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
      .select(col("id"), V.quantizeHof(col("a")).as("qa"),
        V.quantizeHof(col("b")).as("qb"))
    val got = df.select(col("id"), V.qdot(col("qa"), col("qb"))).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val want = df.select(col("id"), V.qdotHof(col("qa"), col("qb"))).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == want)
    // sanity: mismatched lengths are NULL in both
    assert(pairs.zipWithIndex.exists { case ((a, b), i) =>
      a.length != b.length && got(i.toLong).isEmpty })
  }
}
