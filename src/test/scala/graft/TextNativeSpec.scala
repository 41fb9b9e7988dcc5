package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Native text expressions vs their HOF executable specifications:
  * identical output (values AND order) on randomized inputs including
  * edge cases (empty text, multi-space runs, short docs, unicode). */
class TextNativeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    ws <- Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar.map(_.toString),
      Gen.oneOf("aa", "bb", "cc", "ä", "日本", "")))
  } yield ws.mkString(" ")

  private val cases: Seq[String] =
    Seq("", " ", "  ", "a", "a b", "a b c", "a  b c", "ab", "日 本 語 x y") ++
      Gen.listOfN(150, textGen).sample.get

  test("native word_shingles == HOF spec (values and order)") {
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(2, 3, 4)) {
      val got = df.select(col("id"), TextOps.wordShingles(col("text"), n))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val want = df.select(col("id"), TextOps.wordShinglesHof(col("text"), n))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      cases.indices.foreach { i =>
        assert(got(i.toLong) == want(i.toLong),
          s"n=$n text='${cases(i)}': ${got(i.toLong)} != ${want(i.toLong)}")
      }
    }
  }

  test("native char_trigrams == HOF spec (values and order)") {
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"), TextOps.charTrigrams(col("text")))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val want = df.select(col("id"), TextOps.charTrigramsHof(col("text")))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    cases.indices.foreach { i =>
      assert(got(i.toLong) == want(i.toLong),
        s"text='${cases(i)}': ${got(i.toLong)} != ${want(i.toLong)}")
    }
  }
}
