package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE fit/encode vs an independent JVM reference implementation
  * (array-walk merge, not the fold the operator uses) on a random
  * corpus, plus structural invariants. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference merge application: explicit index walk. */
  private def refMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Reference trainer over a (word, freq) table. */
  private def refFit(wf: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var vocab = wf.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Seq.newBuilder[(String, String)]
    for (_ <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((s, f) <- vocab; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((a, b), _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((a, b))
        vocab = vocab.map { case (s, f) => (refMerge(s, a, b), f) }
      }
    }
    merges.result()
  }

  private def corpus(seed: Int) = {
    val rnd = new Random(seed)
    val vocab = Seq("spark", "scala", "shuffle", "partition", "aaa",
      "abab", "banana", "broadcast", "agg", "aab")
    (0 until 60).map(i => (i.toLong,
      (1 to 12).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("fit learns the reference merge sequence (deterministic tie-breaks)") {
    val docs = corpus(5)
    val wf = docs.collect().flatMap(_.getString(1).split(" "))
      .groupBy(identity).map { case (w, os) => (w, os.length.toLong) }
      .toSeq.sortBy { case (w, f) => (-f, w) }
    val expected = refFit(wf, 16)
    assert(Bpe.fit(docs) == expected)
    assert(expected.size == 16)
  }

  test("encodeCounts equals reference encode; counts shrink vs chars") {
    val docs = corpus(6)
    val merges = Bpe.fit(docs)
    val expected = docs.collect().map { r =>
      val toks = r.getString(1).split(" ").map { w =>
        merges.foldLeft(w.map(_.toString).toVector) { case (s, (a, b)) =>
          refMerge(s, a, b)
        }.length.toLong
      }.sum
      (r.getLong(0), toks)
    }.sortBy(_._1).toSeq
    val got = Bpe.tokenize(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // merges strictly compress: fewer tokens than characters
    val nChars = docs.collect()
      .map(_.getString(1).count(_ != ' ').toLong).sum
    assert(got.map(_._2).sum < nChars)
  }

  test("native encode equals the HOF specification path") {
    val docs = corpus(7)
    val merges = Bpe.fit(docs)
    val native = Bpe.tokenize(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val hof = Bpe.encodeCountsHof(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(native == hof)
  }

  test("native encode equals HOF path on degenerate input (empty text, doubled spaces)") {
    // empty docs and doubled spaces produce empty-string words:
    // both paths must yield ZERO tokens for them (not nulls, not
    // fabricated empties from a descending sequence())
    val docs = Seq(
      (1L, ""),                       // one empty word
      (2L, "spark  scala"),           // doubled space -> empty middle word
      (3L, "spark scala spark"),
      (4L, " leading trailing ")      // empty first + last words
    ).toDF("doc_id", "text")
    val merges = Seq(("s", "p"), ("sp", "a"), ("c", "a"))
    val native = Bpe.encodeCounts(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val hof = Bpe.encodeCountsHof(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(native == hof)
    // doc 1 is all empty words -> present with 0 tokens in both
    assert(native.contains((1L, 0L)))
  }

  test("fit splits by codepoint: non-BMP symbols match the native encode alphabet") {
    // U+1D54F (two UTF-16 code units): a code-unit split would train
    // on surrogate halves the encoder never produces
    val repeated = Array.fill(6)("𝕏y").mkString(" ")
    val docs = Seq((1L, repeated), (2L, repeated)).toDF("doc_id", "text")
    val merges = Bpe.fit(docs, nMerges = 1)
    // the only adjacent pair is (𝕏, y) — as full codepoints
    assert(merges == Seq(("𝕏", "y")))
    val counts = Bpe.encodeCounts(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // each word merges to ONE token; 6 words per doc
    assert(counts == Seq((1L, 6L), (2L, 6L)))
  }

  test("mergePass fold equals reference walk on generated token sequences") {
    // generative sweep over a tiny alphabet: short alphabets maximize
    // adjacent-pair collisions, the regime where fold-vs-walk
    // disagreements would hide
    val rnd = new Random(99)
    val alpha = Vector("a", "b", "ab", "c")
    val cases = (1 to 300).map { _ =>
      val syms = Vector.fill(1 + rnd.nextInt(10))(alpha(rnd.nextInt(alpha.size)))
      val a = alpha(rnd.nextInt(alpha.size))
      val b = alpha(rnd.nextInt(alpha.size))
      (syms, a, b)
    }
    val df = cases.map { case (syms, a, b) => (syms.toList, a, b) }
      .zipWithIndex.map { case ((s, a, b), i) => (i.toLong, s, a, b) }
      .toDF("id", "toks", "a", "b")
    // group by merge pair so each distinct pair runs one Spark pass
    cases.map(c => (c._2, c._3)).distinct.foreach { case (a, b) =>
      val sub = cases.zipWithIndex.filter(c => c._1._2 == a && c._1._3 == b)
      val ids = sub.map(_._2.toLong).toSet
      val got = df.where($"a" === a && $"b" === b)
        .select($"id", Bpe.mergePass($"toks", a, b).as("m"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
      sub.foreach { case ((syms, _, _), i) =>
        assert(got(i.toLong) == refMerge(syms, a, b),
          s"case $syms + ($a,$b)")
      }
      assert(ids == got.keySet)
    }
  }

  test("mergePass fold equals reference walk on tricky overlaps") {
    // a a a -> (a,a): leftmost wins, no overlap re-merge
    for ((syms, a, b) <- Seq(
      (Vector("a", "a", "a"), "a", "a"),
      (Vector("a", "b", "a", "b"), "a", "b"),
      (Vector("x", "a", "b", "b"), "a", "b"),
      (Vector("a"), "a", "a"))) {
      val got = Seq(syms.toList).toDF("toks")
        .select(Bpe.mergePass(org.apache.spark.sql.functions.col("toks"), a, b))
        .collect()(0).getSeq[String](0).toVector
      assert(got == refMerge(syms, a, b), s"case $syms + ($a,$b)")
    }
  }
}
