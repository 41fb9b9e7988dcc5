package graft

import java.security.MessageDigest

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash => PH, VectorOps => V}

/** Cross-implementation laws for the portable (Spark==DuckDB) math:
  * the Spark COLUMN implementations must agree with straight JVM
  * reference implementations on randomized inputs, and the derived
  * quantities must satisfy their algebraic bounds. This is the local
  * stand-in for the DuckDB side of the t2 hash compare. */
class PortableMathLawsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** JVM reference of PortableHash.h48. */
  private def refH48(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  test("h48/h31 columns equal the JVM md5 reference and stay in range") {
    val words = Gen.listOfN(200, wordGen).sample.get.distinct
    val got = words.toDF("w")
      .select(col("w"), PH.h48(col("w")).as("h48"), PH.h31(col("w")).as("h31"))
      .collect()
    got.foreach { r =>
      val (w, h48, h31) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(h48 == refH48(w), s"h48 mismatch for '$w'")
      assert(h31 == h48 % PH.P31)
      assert(h48 >= 0 && h48 < (1L << 48))
    }
  }

  test("TextNative.h48 (native byte form) equals the hex-prefix reference") {
    val words = Gen.listOfN(200, wordGen).sample.get.distinct ++
      Seq("", " ", "naïve", "𝕏y")
    words.foreach { w =>
      assert(graft.functions.TextNative.h48(w) == refH48(w),
        s"native h48 mismatch for '$w'")
    }
  }

  test("affine minhash permutations stay in [0, P31) and never overflow") {
    val hs = Gen.listOfN(300, Gen.chooseNum(0L, PH.P31 - 1)).sample.get
    val df = hs.toDF("h").select(
      array((0 until PH.MinhashK).map(j => PH.affine(j)(col("h"))): _*).as("a"))
    df.collect().foreach { r =>
      r.getSeq[Long](0).foreach(v => assert(v >= 0 && v < PH.P31))
    }
  }

  test("quantize equals floor(x*1024) in exact double math") {
    val xs = Gen.listOfN(300, Gen.chooseNum(-8.0f, 8.0f)).sample.get
    val got = Seq(xs).toDF("v")
      .select(V.quantize(col("v"))).head.getSeq[Long](0)
    xs.zip(got).foreach { case (x, q) =>
      assert(q == math.floor(x.toDouble * 1024).toLong)
    }
  }

  test("cos_ppm is bounded by ±1e6 (integer Cauchy-Schwarz)") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-4.0f, 4.0f)).map(_.toArray)
    val pairs = Gen.listOfN(60, Gen.zip(vecGen, vecGen)).sample.get
      .filter { case (a, b) => a.exists(_ != 0f) && b.exists(_ != 0f) }
    val df = pairs.map { case (a, b) => (a.toSeq, b.toSeq) }.toDF("a", "b")
      .select(V.quantize(col("a")).as("qa"), V.quantize(col("b")).as("qb"))
      .select(V.cosPpm(V.qdot(col("qa"), col("qb")),
        V.qnorm2(col("qa")), V.qnorm2(col("qb"))).as("c"),
        V.qnorm2(col("qa")).as("na"), V.qnorm2(col("qb")).as("nb"))
      .where(col("na") > 0 && col("nb") > 0)
    df.collect().foreach { r =>
      val c = r.getLong(0)
      assert(c <= 1000000L && c >= -1000001L, s"cos_ppm out of bounds: $c")
    }
  }

  test("exact dedup partitions the corpus: sum(n_dups) == row count") {
    val texts = Gen.listOfN(80, Gen.oneOf("a b c", "d e f", "g h i", "j k"))
      .sample.get
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.exact(d)
    assert(out.agg(sum("n_dups")).head.getLong(0) == texts.length)
    assert(out.count() == texts.distinct.length)
  }

  test("fingerprint stays in [0, P31) and is deterministic") {
    val docs = Gen.listOfN(50, Gen.nonEmptyListOf(wordGen).map(_.mkString(" ")))
      .sample.get.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val a = graft.operators.TextAnalysis.fingerprint(docs).collect()
    val b = graft.operators.TextAnalysis.fingerprint(docs).collect()
    assert(a.sameElements(b))
    a.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < PH.P31))
  }
}
