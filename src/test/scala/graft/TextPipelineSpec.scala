package graft

import java.security.MessageDigest

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.relational.Tables

/** Properties of the r2 corpus-curation operators (mixture sampling,
  * quantile quality gate, HTML stripping, TF-IDF) against JVM
  * reference implementations — the cross-engine oracle is the driver's
  * DuckDB compare; these pin the operator SEMANTICS. */
class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  /** JVM reference of PortableHash.h31: first 12 hex chars of md5. */
  private def h31(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(12)
    java.lang.Long.parseLong(hex, 16) % 2147483647L
  }

  test("sampleMix keeps exactly the docs whose salted hash clears the lang rate") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val rate = Map("en" -> 400000L, "de" -> 800000L).withDefaultValue(1000000L)
    val expected = docs.filter { case (id, lang) =>
      h31(s"mix:$id") % 1000000L < rate(lang)
    }.map(_._1).toSet
    val got = TextAnalysis.sampleMix(Tables.documents(spark, sf))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // the mix is a real downsample of the dominant language
    assert(expected.size < docs.length)
  }

  test("qualityFilter keeps the per-language top fraction by percent rank") {
    val feats = TextAnalysis.qualityScore(Tables.documents(spark, sf))
      .select("doc_id", "quality_ppm").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val langs = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = langs.groupBy(_._2).flatMap { case (_, members) =>
      val ordered = members.keys.toSeq.sortBy(id => (feats(id), id))
      val n = ordered.size
      ordered.zipWithIndex.collect { case (id, i)
        if math.floor(1000000.0 * i / math.max(n - 1, 1)).toLong >= 200000L => id }
    }.toSet
    val got = TextAnalysis.qualityFilter(Tables.documents(spark, sf))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.size < langs.size) // the gate drops the low-quality tail
  }

  test("htmlStrip recovers the original text from the tag-wrapped form") {
    val docs = Tables.documents(spark, sf)
    val wrapped = docs.select($"doc_id", $"text",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("<p>"), $"text",
        org.apache.spark.sql.functions.lit("</p><div>tail</div>")).as("html"))
    val out = TextAnalysis.htmlStrip(wrapped, "html")
      .select("doc_id", "text", "n_tags", "stripped").collect()
    out.foreach { r =>
      assert(r.getLong(2) == 4L, s"doc ${r.getLong(0)}: expected 4 tags")
      assert(r.getString(3) == r.getString(1) + " tail",
        s"doc ${r.getLong(0)}: strip did not recover text")
    }
  }

  test("sampleStratified takes exactly min(n, |group|) docs in hash order") {
    val docs = Tables.documents(spark, sf)
    val byLang = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._2)
    val n = 20
    val expected = byLang.values.flatMap { members =>
      members.map(_._1).sortBy(id => (h31(s"strat:$id"), id)).take(n)
    }.toSet
    val got = TextAnalysis.sampleStratified(docs, nPerGroup = n)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // exact per-group sizes
    val sizes = TextAnalysis.sampleStratified(docs, nPerGroup = n)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, members) =>
      assert(sizes(lang) == math.min(n, members.size).toLong, s"lang $lang")
    }
  }

  test("chunk: non-overlapping chunks reassemble the document exactly") {
    val docs = Tables.documents(spark, sf)
    // stride == chunkTokens -> a partition of the token sequence
    val out = TextAnalysis.chunk(docs, chunkTokens = 8, stride = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val reassembled = out(id).sortBy(_._2).map(_._3).mkString(" ")
      assert(reassembled == text, s"doc $id reassembly")
    }
  }

  test("chunk: overlapping windows have the declared stride and width") {
    val docs = Tables.documents(spark, sf)
    val totals = docs.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ", -1).length.toLong).toMap
    val rows = TextAnalysis.chunk(docs, chunkTokens = 12, stride = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, _, start, n), i) =>
        assert(start == 1 + 8L * i, s"doc $id chunk $i start")
        // width = remaining tokens capped at the window size
        assert(n == math.min(totals(id) - start + 1, 12L),
          s"doc $id chunk $i width")
      }
      // window starts cover the token range: last start <= total
      assert(sorted.last._3 <= totals(id), s"doc $id coverage")
    }
  }

  test("compressRatio separates repetitive from high-entropy text") {
    val rnd = new Random(13)
    val repetitive = Seq.fill(100)("the same phrase again").mkString(" ")
    val natural = (1 to 400).map(_ =>
      rnd.alphanumeric.take(5).mkString).mkString(" ")
    val d = Seq((1L, repetitive), (2L, natural)).toDF("doc_id", "text")
    val out = TextAnalysis.compressRatio(d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) < 100000L, s"repetitive ratio ${out(1L)}")
    assert(out(2L) > 500000L, s"natural ratio ${out(2L)}")
    // rerun-stable (the rows-only check and DeterminismSpec rely on it)
    val again = TextAnalysis.compressRatio(d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == out)
  }

  test("ngramLm matches the brute-force bigram reference") {
    val rnd = new Random(17)
    val vocab = (1 to 12).map(i => s"w$i")
    val texts = (0 until 60).map(_ =>
      (1 to 1 + rnd.nextInt(15)).map(_ =>
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // brute-force: corpus bigram/context counts, min-count-2 prune,
    // floor-ppm conditional, per-doc floor mean (0 when < 2 tokens)
    val bigrams = texts.flatMap(t => t.split(" ").sliding(2)
      .collect { case Array(a, b) => (a, b) })
    val c12 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = bigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val expected = texts.zipWithIndex.map { case (t, i) =>
      val bs = t.split(" ").sliding(2).collect { case Array(a, b) => (a, b) }.toSeq
      if (bs.isEmpty) (i.toLong, 0L, 0L)
      else {
        val sp = bs.map { b =>
          if (c12(b) >= 2) c12(b) * 1000000L / c1(b._1) else 0L
        }.sum
        (i.toLong, bs.size.toLong, sp / bs.size)
      }
    }.sorted
    val got = TextAnalysis.ngramLm(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == expected)
    // a doc made of corpus-frequent bigrams must outscore one made of
    // singleton bigrams (the OOV-scores-zero convention)
    val byId = got.map(g => g._1 -> g._3).toMap
    assert(byId.values.max > 0L)
  }

  test("readability orders simple text above vowel-dense run-ons") {
    val simple = "the cat sat. the dog ran. it was fun."
    val dense = "extraordinarily sesquipedalian vocabulary " +
      "overwhelming unsophisticated audiences continuously"
    val d = Seq((1L, simple), (2L, dense)).toDF("doc_id", "text")
    val out = TextAnalysis.readability(d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // hand-check doc 1: 9 words, 3 sentences, syllables = vowel groups
    val vg = "[aeiou]+".r.findAllIn(simple).size.toLong
    assert(out(1L) == (9L, 3L, vg,
      206835L - 1015L * 9 / 3 - 84600L * vg / 9))
    assert(out(1L)._4 > out(2L)._4, s"$out")
    // clamps: empty text scores with all features at the floor of 1
    val e = TextAnalysis.readability(Seq((3L, "")).toDF("doc_id", "text"))
      .collect().head
    assert(e.getLong(1) == 1L && e.getLong(2) == 1L && e.getLong(3) == 1L)
  }

  test("tfidf matches the brute-force reference on a random corpus") {
    val rnd = new Random(11)
    val vocab = (1 to 30).map(i => s"w$i")
    val texts = (0 until 40).map(_ =>
      (1 to 20).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val n = texts.size
    val tf = texts.zipWithIndex.flatMap { case (t, i) =>
      t.split(" ").groupBy(identity).map { case (w, os) => (i.toLong, w, os.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (w, rs) => w -> rs.size.toLong }
    val expected = tf.groupBy(_._1).toSeq.flatMap { case (id, rows) =>
      val scored = rows.map { case (_, w, f) =>
        val idf = math.floor(1000000.0 * n / df(w)).toLong
        (w, f, idf, f * idf)
      }.sortBy { case (w, _, _, s) => (-s, w) }
      scored.take(3).zipWithIndex.map { case ((w, f, idf, s), i) =>
        (id, (i + 1).toLong, w, f, idf, s)
      }
    }.sorted
    val got = TextAnalysis.tfidf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sorted
    assert(got == expected)
  }

  test("ngramNovelty: doc 1 is all-novel, an exact copy adds zero, " +
    "partial overlap attributes first-seen by min doc_id (r7)") {
    val a = (1 to 20).map(i => s"a$i").mkString(" ")
    val b = (1 to 20).map(i => s"b$i").mkString(" ")
    val d = Seq(1L -> a, 2L -> a, 3L -> (a + " " + b), 4L -> b)
      .toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val aGrams = 18L // 20 tokens -> 18 distinct trigrams
    assert(got(1L) == ((aGrams, aGrams, 1000000L)))
    assert(got(2L) == ((aGrams, 0L, 0L)))
    // doc 3 = a ++ b: novel grams are b's 18 plus the 2 bridge grams
    val (n3, novel3, ppm3) = got(3L)
    assert(n3 == 38L && novel3 == 20L)
    assert(ppm3 == 20L * 1000000L / 38L)
    assert(got(4L) == ((aGrams, 0L, 0L)), "doc 4's grams first seen in doc 3")
  }

  test("winnow matches a brute-force rightmost-min reference and " +
    "honors the w-density guarantee (r7)") {
    val rnd = new Random(7)
    val vocab = (1 to 9).map(i => s"t$i")
    val texts = (0 until 25).map { i =>
      // include degenerate lengths: 0, 1, 2 grams
      val n = if (i < 3) i + 2 else 5 + rnd.nextInt(40)
      (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } :+ ""
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def h31(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(6)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 2147483647L
    }
    val expected = texts.zipWithIndex.map { case (t, id) =>
      val wsArr = if (t.isEmpty) Array.empty[String] else t.split(" ")
      val grams = wsArr.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toIndexedSeq
      val hv = grams.map(h31)
      val nWin = math.max(hv.length - 3, 1)
      val sel = (1 to nWin).flatMap { i =>
        val win = hv.slice(i - 1, i + 3)
        if (win.isEmpty) None
        else {
          val m = win.min
          val pos = (i to math.min(i + 3, hv.length))
            .filter(j => hv(j - 1) == m).max
          Some((pos.toLong, m))
        }
      }.distinct
      (id.toLong, hv.length.toLong, sel.length.toLong,
        sel.map { case (p, f) => f * p }.sum,
        if (sel.isEmpty) -1L else sel.map(_._2).min,
        if (sel.isEmpty) -1L else sel.map(_._2).max)
    }.sortBy(_._1)
    val got = TextAnalysis.winnow(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // density guarantee: consecutive selected positions ≤ w apart
    texts.zipWithIndex.foreach { case (t, id) =>
      val wsArr = if (t.isEmpty) Array.empty[String] else t.split(" ")
      val hv = wsArr.sliding(3).filter(_.length == 3)
        .map(a => h31(a.mkString(" "))).toIndexedSeq
      if (hv.length >= 4) {
        val sel = (1 to hv.length - 3).map { i =>
          val m = hv.slice(i - 1, i + 3).min
          (i to i + 3).filter(j => hv(j - 1) == m).max
        }.distinct.sorted
        sel.sliding(2).foreach {
          case Seq(a, b) => assert(b - a <= 4, s"doc $id gap ${b - a}")
          case _ =>
        }
      }
    }
  }

  test("langIdConfusion: cells reconcile with langId's per-doc " +
    "predictions; row shares floor-sum below 10^6 (r7)") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.relational.Tables.documents(spark, sfDir)
    val preds = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val labels = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ref = preds.toSeq.map { case (id, p) => (labels(id), p) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = TextAnalysis.langIdConfusion(docs).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val cell = (r.getString(0), r.getString(1))
      assert(ref(cell) == r.getLong(2), s"cell $cell")
      assert(r.getLong(4) == (if (cell._1 == cell._2) 1L else 0L))
    }
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet == ref.keySet)
    got.groupBy(_.getString(0)).values.foreach { rows =>
      val s = rows.map(_.getLong(3)).sum
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"row ppm sum $s out of floor range")
    }
  }

  test("collocations matches the brute-force integer-PMI reference " +
    "on a random corpus (r7)") {
    val rnd = new Random(23)
    val vocab = (1 to 12).map(i => s"w$i")
    // plant a real collocation: w1 is always followed by w2
    val texts = (0 until 50).map { _ =>
      (1 to 30).flatMap { _ =>
        val w = vocab(rnd.nextInt(vocab.size))
        if (w == "w1") Seq("w1", "w2") else Seq(w)
      }.mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val uni = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, os) => w -> os.length.toLong }
    val pairs = texts.flatMap(_.split(" ").sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))))
      .groupBy(identity).map { case (p, os) => p -> os.length.toLong }
    val nTotal = pairs.values.sum
    val expected = pairs.filter(_._2 >= 5).map { case ((a, b), c) =>
      (a, b, c, c * 1000000L * nTotal / (uni(a) * uni(b)))
    }.toSeq.sortBy { case (a, b, _, s) => (-s, a, b) }.take(50)
    val got = TextAnalysis.collocations(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
    // the planted pair must rank first: P(w2 | w1) = 1
    assert(got.head._1 == "w1" && got.head._2 == "w2")
  }

  test("soundex6: classic landmark codes, padding, run collapse, " +
    "H/W transparency (r7)") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      "Robert" -> "R163", "Rupert" -> "R163", // classic pair
      "Pfister" -> "P236",                    // leading same-code run
      "Tymczak" -> "T522",                    // Y-as-vowel run break
      "Ashcraft" -> "A261",                   // H-transparency: SC one code
      "Lee" -> "L000",                        // zero padding
      "Gauss" -> "G200", "Ghosh" -> "G200")   // H deletion
    val got = cases.map(_._1).toDF("w")
      .select(col("w"), graft.functions.TextOps.soundex6(col("w")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (w, want) =>
      assert(got(w) == want, s"$w: got ${got(w)}, want $want")
    }
  }

  test("qualityLpm learns a separable corpus perfectly and its eval " +
    "reconciles; driver Cramer matches a hand NumPy-style solve (r9)") {
    // constructed separation: en docs are stopword-dense and long,
    // others stopword-free and short — the LPM must recover weights
    // that classify this perfectly at the 0.5 cut
    // vary lengths within each class so the feature matrix has full
    // rank (three unknowns need three linearly independent rows)
    val en = (0 until 10).map(i => (i.toLong,
      (("the a " * (20 + 3 * i)) + s"body$i words here").trim, "en"))
    val other = (10 until 20).map(i => (i.toLong,
      (s"w$i x$i y$i z$i " * (1 + i % 5)).trim, "de"))
    val docs = (en ++ other).toDF("doc_id", "text", "lang")
    val out = graft.operators.TextAnalysis.qualityLpm(docs).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getLong(5) == r.getLong(1),
        s"doc ${r.getLong(0)}: predicted ${r.getLong(5)} != y ${r.getLong(1)}")
    }
    val ev = graft.operators.TextAnalysis.qualityLpmEval(docs).head()
    assert(ev.getLong(0) == 10 && ev.getLong(3) == 10)
    assert(ev.getLong(1) == 0 && ev.getLong(2) == 0)
    assert(ev.getLong(4) == 1000000L)
    // hand-check the normal equations on the tiny corpus: recompute
    // the sufficient statistics + Cramer in BigInt here and assert
    // the distributed scores match w0 + w1 x1 + w2 x2
    val feats = out.map(r => (r.getLong(2), r.getLong(3), r.getLong(1)))
    val n = BigInt(feats.length)
    val s1 = BigInt(feats.map(_._1).sum); val s2 = BigInt(feats.map(_._2).sum)
    val s11 = BigInt(feats.map(f => f._1 * f._1).sum)
    val s12 = BigInt(feats.map(f => f._1 * f._2).sum)
    val s22 = BigInt(feats.map(f => f._2 * f._2).sum)
    val b0 = BigInt(feats.map(_._3).sum)
    val b1 = BigInt(feats.map(f => f._1 * f._3).sum)
    val b2 = BigInt(feats.map(f => f._2 * f._3).sum)
    def det3(a: Seq[BigInt]): BigInt = {
      val Seq(a00, a01, a02, a10, a11, a12, a20, a21, a22) = a
      a00 * (a11 * a22 - a12 * a21) - a01 * (a10 * a22 - a12 * a20) +
        a02 * (a10 * a21 - a11 * a20)
    }
    val d0 = det3(Seq(n, s1, s2, s1, s11, s12, s2, s12, s22))
    val sg = d0.sign
    val det = d0 * sg
    val wn = Seq(det3(Seq(b0, s1, s2, b1, s11, s12, b2, s12, s22)),
      det3(Seq(n, b0, s2, s1, b1, s12, s2, b2, s22)),
      det3(Seq(n, s1, b0, s1, s11, b1, s2, s12, b2))).map(_ * sg)
    def fd(a: BigInt, b: BigInt): BigInt = {
      val q = a / b; if (a % b != 0 && a.sign != b.sign) q - 1 else q
    }
    val w = wn.map(x => fd(x * 1000000, det).toLong)
    out.foreach { r =>
      assert(r.getLong(4) == w(0) + w(1) * r.getLong(2) + w(2) * r.getLong(3))
    }
  }

  test("qualityLpm raises on a degenerate (constant-feature) corpus") {
    val docs = (0 until 5).map(i =>
      (i.toLong, "same text here always", "en")).toDF("doc_id", "text", "lang")
    val e = intercept[Exception] {
      graft.operators.TextAnalysis.qualityLpm(docs).collect()
    }
    assert(e.getMessage.contains("degenerate"))
  }

  test("dsirWeights (r13): on a vocabulary-separated corpus every " +
    "target-vocab doc outranks every off-target doc, mixed docs land " +
    "between, and weights are length-invariant for pure-vocab docs") {
    import org.apache.spark.sql.functions.lit
    // target docs speak {talpha, tbeta}; the rest speak {omega, opi};
    // doc 90 mixes the two vocabularies half and half
    val docs = ((0L until 10L).map(i =>
        (i, "talpha tbeta talpha tbeta", "tgt")) ++
      (10L until 50L).map(i => (i, "omega opi omega", "oth")) ++
      Seq((90L, "talpha tbeta omega opi", "oth")))
      .toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
    val w = TextAnalysis.dsirWeights(docs, targetSource = "tgt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tgtW = (0L until 10L).map(w)
    val othW = (10L until 50L).map(w)
    // pure-vocab docs of one side all score identically: the
    // likelihood ratio is a per-token bucket-mass ratio, so document
    // LENGTH cancels for single-vocabulary docs
    assert(tgtW.distinct.size == 1 && othW.distinct.size == 1)
    assert(tgtW.head > w(90L) && w(90L) > othW.head,
      s"mixed doc must land between: ${tgtW.head} > ${w(90L)} > ${othW.head}")
    // target vocab dominates the target distribution -> weight well
    // above the 1e6 selection line; off-target well below
    assert(tgtW.head > 1000000L && othW.head < 1000000L)
  }

  test("dsirWeightsFrom (r14): the decimal-widened ratio is exact where " +
    "the Long product 10^6*num would wrap, and the injectable fit " +
    "composes weights + sample with zero aggregates in the scoring plan") {
    import org.apache.spark.sql.functions.lit
    // extreme fitted masses (p=10^6+1, q=1 after smoothing): num hits
    // n_tokens*(10^6+1), which wrapped the old 10^6*num Long product
    // at ~9.2e3 tokens already — a 16k-token doc crosses the boundary
    val model = TextAnalysis.DsirModel(
      Seq.fill(TextAnalysis.DsirBuckets)(1000001L),
      Seq.fill(TextAnalysis.DsirBuckets)(1L))
    val nTok = 16384
    val docs = Seq((0L, Array.fill(nTok)("w").mkString(" "), "src0"))
      .toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
    val w = TextAnalysis.dsirWeightsFrom(docs, model).collect()
    // num = n*(10^6+1), den = n: ratio is exactly 10^6*(10^6+1)
    assert(w.head.getLong(1) == 1000000L * 1000001L,
      s"got ${w.head.getLong(1)} — the ratio must not wrap")
    // composed weights+sample over ONE fit: both scoring plans are
    // pure row-local projections — no HashAggregate anywhere (the
    // 64-row fit aggregate ran once, outside both plans)
    val corpus = Tables.documents(spark, sf)
    val fit = TextAnalysis.dsirFit(corpus)
    val pw = TextAnalysis.dsirWeightsFrom(corpus, fit)
      .queryExecution.executedPlan.toString
    val ps = TextAnalysis.dsirSampleFrom(corpus, fit)
      .queryExecution.executedPlan.toString
    assert(!pw.contains("Aggregate") && !ps.contains("Aggregate"),
      "model application must stay aggregate-free")
    // and the model-sharing path returns byte-identical results to
    // the self-fitting declared queries
    val a = TextAnalysis.dsirSample(corpus).collect().toSeq
    val b = TextAnalysis.dsirSampleFrom(corpus, fit).collect().toSeq
    assert(a == b)
  }
}
