package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash => PH}
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Semantic contracts of the training-data pipeline operators
  * (dedup / similarity / text analysis / multimodal) on constructed
  * inputs — the DuckDB hash compare (t2) checks exact values on the
  * corpus; these check the operator LAWS on adversarial rows. */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))

  test("portable h48 matches the DuckDB definition on a known value") {
    // DuckDB: SELECT ('0x'||substr(md5('hello world'),1,12))::BIGINT
    val got = spark.range(1)
      .select(PH.h48(lit("hello world"))).head.getLong(0)
    assert(got == 104136779227166L)
  }

  test("exact dedup keeps min doc_id and counts multiplicity") {
    val d = docs(3L -> "a b c", 1L -> "a b c", 2L -> "x y z")
    val out = Dedup.exact(d).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq(1L -> 2L, 2L -> 1L))
  }

  test("minhash: identical docs share full signatures; disjoint docs don't") {
    val d = docs(1L -> "a b c d e f", 2L -> "a b c d e f",
      3L -> "q r s t u v w")
    val sigs = Dedup.minhashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("minhash LSH surfaces an identical pair with 16/16 matches") {
    val d = docs(1L -> "a b c d e f", 2L -> "a b c d e f",
      3L -> "q r s t u v w")
    val pairs = Dedup.minhashLsh(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs.contains((1L, 2L, 16L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("OPH: identical docs share signatures; densification fills " +
    "every slot of a one-shingle doc (r7)") {
    val d = docs(1L -> "a b c d e f", 2L -> "a b c d e f",
      3L -> "q r s t u v w", 4L -> "x y z")
    val sigs = Dedup.ophSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    // doc 4 has exactly one 3-gram shingle -> one occupied bin; the
    // other 15 slots must all be densified (non-null, in [0, P31))
    assert(sigs(4L).length == 16)
    assert(sigs(4L).forall(v => v >= 0L &&
      v < graft.functions.PortableHash.P31))
    // rotation offsets keep borrowed slots distinct from the source
    assert(sigs(4L).distinct.length > 1)
    // identical pair still surfaces through the shared banding/join
    val pairs = Dedup.ophLsh(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs.contains((1L, 2L, 16L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("OPH signature is partitioning-invariant (bin mins + " +
    "densification commute with the shuffle)") {
    val many = docs((1L to 30L).map(i =>
      i -> s"tok${i % 7} alpha beta gamma delta tok${i % 5} end$i"): _*)
    val a = Dedup.ophSignatures(many).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = Dedup.ophSignatures(many.repartition(13)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }

  test("native OPH signature equals the aggregate specification") {
    val many = docs((1L to 40L).map(i =>
      i -> s"tok${i % 9} alpha beta gamma delta tok${i % 4} tail$i"): _*)
    val native = Dedup.ophSignatures(many).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = Dedup.ophSignaturesAgg(many).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == agg)
  }

  test("simhash: identical docs get identical fingerprints") {
    val d = docs(1L -> "spark flink beam", 2L -> "spark flink beam",
      3L -> "totally different words here")
    val fp = Dedup.simhash(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp.values.forall(v => v >= 0 && v < (1L << 48)))
  }

  test("ngram jaccard: identical docs score 1e6 ppm; near dups score high") {
    val d = docs(1L -> "a b c d e f g h", 2L -> "a b c d e f g h",
      3L -> "a b c d e f g z")
    val out = Dedup.ngramJaccard(d, minJaccardPpm = 0L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(out((1L, 2L)) == 1000000L)
    assert(out((1L, 3L)) > 400000L && out((1L, 3L)) < 1000000L)
  }

  test("embedding near-dup finds an exact duplicate vector at ~1e6 ppm") {
    val v = Array.tabulate(16)(i => (if (i % 3 == 0) 1.0f else -0.5f))
    val w = Array.tabulate(16)(i => (if (i % 2 == 0) -1.0f else 0.25f))
    val e = Seq((1L, v.toSeq), (2L, v.toSeq), (3L, w.toSeq))
      .toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(e, nBands = 4, bitsPerBand = 4,
      minCosPpm = 900000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 1 && out.head._1 == 1L && out.head._2 == 2L)
    assert(out.head._3 >= 999999L) // floor rounding of exactly 1.0
  }

  test("knn brute: rank 1 neighbor of a duplicated vector is its twin") {
    val mk = (seed: Int) => Array.tabulate(16)(i =>
      math.sin(seed * 31 + i).toFloat)
    val e = (0L to 9L).map(i =>
      (i, (if (i == 5L) mk(0) else mk(i.toInt)).toSeq))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnBrute(e, nQueries = 1, k = 3).collect()
    assert(out.head.getLong(2) == 5L) // neighbor_id of rank 1 for query 0
    assert(out.head.getLong(3) >= 999999L)
  }

  test("knn lsh returns a subset of brute-force candidates, same scoring") {
    val e = (0L to 20L).map(i =>
      (i, Array.tabulate(16)(d => math.cos(i * 7 + d).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val brute = Similarity.knnBrute(e, nQueries = 2, k = 21).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3))).toMap
    val lsh = Similarity.knnLshBucketed(e, nQueries = 2, k = 5).collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(brute.contains(key) && brute(key) == r.getLong(3),
        s"lsh scored $key differently from brute force")
    }
  }

  test("token counts on a constructed doc") {
    val d = docs(1L -> "the quick brownfox 42 jumped")
    val r = TextAnalysis.tokenCounts(d).head
    assert(r.getLong(1) == 5L) // ws tokens
    assert(r.getLong(2) == 4L) // alpha runs: the, quick, brownfox, jumped
    assert(r.getLong(3) == 1L) // numeric runs
    // subword: ceil(3/4)+ceil(5/4)+ceil(8/4)+ceil(2/4)+ceil(6/4) = 1+2+2+1+2
    assert(r.getLong(4) == 8L)
  }

  test("fingerprint is order-sensitive (rolling, not bag-of-words)") {
    val d = docs(1L -> "a b c", 2L -> "c b a", 3L -> "a b c")
    val fp = TextAnalysis.fingerprint(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(3L))
    assert(fp(1L) != fp(2L))
  }

  test("quality: stopword ratio and short-doc penalty") {
    val d = docs(1L -> "the a the a", 2L -> Seq.fill(25)("word").mkString(" "))
    val out = TextAnalysis.qualityScore(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out(1L)._1 == 1000000L) // all stopwords
    assert(out(1L)._2 == 1000000L - 500000L - 250000L)
    assert(out(2L)._1 == 0L)
    assert(out(2L)._2 == 1000000L)
  }

  test("langId predicts deterministically with lang-tagged corpus") {
    val d = Seq((1L, "aaa bbb ccc", "xx"), (2L, "aaa bbb ccc", "yy"),
      (3L, "zzz qqq rrr", "yy")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(d, profileN = 50).collect()
    assert(out.length == 3)
    // doc 1/2 trigram sets match both xx and yy profiles equally →
    // lexicographic tiebreak picks xx
    val byDoc = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc(1L) == "xx" && byDoc(2L) == "xx")
    assert(byDoc(3L) == "yy")
  }

  test("multimodal stub decode: frame count and checksum contract") {
    val payload = ("x" * 130).getBytes("UTF-8")
    val f = Multimodal.stubDecode(Multimodal.BinaryDoc(7L, payload))
    assert(f.n_bytes == 130L)
    assert(f.n_frames == 3L) // ceil(130/64)
    assert(f.frame_checksum == 3L * 'x'.toLong)
    val viaSpark = Multimodal.extractFeatures(
      docs(7L -> ("x" * 130)))(spark).head
    assert(viaSpark.getLong(1) == 130L && viaSpark.getLong(2) == 3L)
  }

  test("LSH skew guard drops degenerate buckets") {
    // 30 identical docs = one degenerate bucket per band; cap 5 kills
    // all pairing, no cap yields 30*29/2 pairs
    val d = docs((1L to 30L).map(i => i -> "a b c d e f"): _*)
    assert(Dedup.minhashLsh(d).count() == 435L)
    assert(Dedup.minhashLsh(d, maxBucketSize = Some(5)).count() == 0L)
  }

  test("asOf join picks the most recent right row per key (ties: right first)") {
    import graft.operators.AsOfJoin
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 90L, 900L), (1L, 100L, 901L), (1L, 150L, 902L),
      (2L, 60L, 903L)).toDF("k", "t", "rv")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("lv"), Seq("rv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // left (1,100) matches right at SAME t (inclusive >=) -> 901
    // left (1,200) matches right 150 -> 902
    // left (2,50): no right at-or-before -> dropped (inner)
    assert(out == Set((1L, 100L, 10L, 901L), (1L, 200L, 11L, 902L)))
  }

  test("simhash pairs: identical docs at hamming 0; blocking finds them") {
    val d = docs(1L -> "a b c d e f", 2L -> "a b c d e f",
      3L -> "q r s t u v w x y z aa bb cc dd")
    val out = Dedup.simhashPairs(d, maxHamming = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 0L)))
  }

  test("native minhash signature equals the aggregate specification") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docs(
      1L -> base, 2L -> base.replace("w7", "x"), 3L -> base,
      4L -> "a b",          // < 3 words: dropped by BOTH paths
      5L -> "q r s t u v", 6L -> "a  b c d")
    val native = Dedup.minhashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = Dedup.minhashSignaturesAgg(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == agg)
    assert(!native.contains(4L))
  }

  test("native simhash48 equals the aggregate specification (incl. edge cases)") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docs(
      1L -> base, 2L -> base.replace("w7", "x"),
      3L -> "",                     // empty text -> one empty word
      4L -> "a  b",                 // doubled space -> empty middle word
      5L -> "naïve 𝕏 café résumé", // non-ASCII + non-BMP
      6L -> "a")
    val native = Dedup.simhash(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val agg = Dedup.simhashAgg(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(native == agg)
  }

  test("simhashPairsWide is EXACT at hamming<=3 (matches brute force)") {
    // mixed corpus: identical pairs, one-word mutations, unrelated docs
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = docs((1L to 16L).map { i =>
      i -> (i % 4 match {
        case 0 => base
        case 1 => base.replace(s"w${(i % 13) + 1}", s"x$i")
        case 2 => base.replace("w3 w4", "x y")
        case _ => s"unrelated doc $i " + (1 to 20).map(j => s"z${i}_$j").mkString(" ")
      })
    }: _*)
    val fps = Dedup.simhash(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- fps.keys; b <- fps.keys if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = Dedup.simhashPairsWide(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "test corpus should contain d<=3 pairs")
    assert(got == brute)
  }

  test("simhashPairsWide bucket cap drops degenerate buckets") {
    val d = docs((1L to 30L).map(i => i -> "a b c d e f"): _*)
    assert(Dedup.simhashPairsWide(d).count() == 435L)
    assert(Dedup.simhashPairsWide(d, maxBucketSize = Some(5)).count() == 0L)
  }

  test("incremental corpus-side bucket cap: degenerate corpus bucket dropped, exact path unaffected") {
    val boiler = (1 to 30).map(i => s"b$i").mkString(" ")
    val distinctDoc = (1 to 30).map(i => s"d$i").mkString(" ")
    // 30 identical boilerplate corpus docs -> one degenerate bucket per band
    val corpus = docs(((100L to 129L).map(i => i -> boiler) :+
      (200L -> distinctDoc)): _*)
    val batch = docs(
      1L -> boiler.replace("b7", "qq"),      // near-dup of the BOILERPLATE only
      2L -> distinctDoc.replace("d7", "qq"), // near-dup of the distinct doc
      3L -> boiler)                          // exact copy of the boilerplate
    def labels(cap: Option[Int]) =
      Dedup.incremental(batch, corpus, maxBucketSize = cap).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val un = labels(None)
    assert(un(1L) == ((0L, 1L, 0L)) && un(2L) == ((0L, 1L, 0L)))
    assert(un(3L)._1 == 1L)
    val capped = labels(Some(5))
    // the boilerplate bucket (30 members) is dropped: doc 1 loses its
    // near-dup evidence; doc 2's (small) bucket survives; doc 3 is
    // still caught by the exact-text left-semi join
    assert(capped(1L) == ((0L, 0L, 1L)), s"doc 1: ${capped(1L)}")
    assert(capped(2L) == ((0L, 1L, 0L)), s"doc 2: ${capped(2L)}")
    assert(capped(3L)._1 == 1L, s"doc 3: ${capped(3L)}")
  }

  test("incremental dedup labels exact/near dups across the batch boundary") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = docs(100L -> base, 101L -> "other corpus content entirely x y z",
      102L -> "unrelated corpus doc a b c d e f")
    val batch = docs(
      1L -> base,                       // exact dup of corpus 100
      2L -> base.replace("w7", "qq"),   // near dup of corpus 100
      3L -> "brand new never seen words one two three four five")
    val out = Dedup.incremental(batch, corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((1L, 1L, 0L)), s"doc 1: ${out(1L)}") // exact implies near too
    assert(out(2L) == ((0L, 1L, 0L)), s"doc 2: ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 1L)), s"doc 3: ${out(3L)}")
  }

  test("lshVerified is a subset of exact ngramJaccard with identical scores") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docs((1L to 12L).map { i =>
      i -> (if (i % 3 == 0) base.replace(s"w${i % 7 + 1}", s"x$i") else base)
    }: _*)
    val exact = Dedup.ngramJaccard(d, minJaccardPpm = 500000L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    val verified = Dedup.lshVerified(d, minJaccardPpm = 500000L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4)))
    assert(verified.nonEmpty)
    verified.foreach { case (pair, j) =>
      assert(exact.contains(pair) && exact(pair) == j,
        s"$pair scored $j vs exact ${exact.get(pair)}")
    }
  }

  test("near-dup clusters: transitive closure labels chains with the min id") {
    // 1~2 and 2~3 are near-dups (one word changed), 1 and 3 are NOT a
    // direct LSH pair necessarily -- clustering must still merge them
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val v2 = base.replace("w7", "x")
    val v3 = v2.replace("w23", "y")
    val d = docs(1L -> base, 2L -> v2, 3L -> v3, 9L -> "totally different z q")
    val out = Dedup.nearDupClusters(d, minEstJaccardPpm = 500000L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(9L) == 9L)
  }

  test("spanScrub masks exactly the positions covered by shared 8-grams") {
    val d = docs(
      1L -> "a b c d e f g h x y z",          // shared span at start 0
      2L -> "p q r a b c d e f g h w",        // same span at start 3
      3L -> "one two three four five six seven eight nine", // unique
      4L -> "tiny doc")                       // < 8 words: no grams
    val out = Dedup.spanScrub(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((11L, 8L, "x y z")))
    assert(out(2L) == ((12L, 8L, "p q r w")))
    assert(out(3L) == ((9L, 0L, "one two three four five six seven eight nine")))
    assert(out(4L) == ((2L, 0L, "tiny doc")))
  }

  test("spanScrub: overlapping duplicated spans cover the union of positions") {
    // doc 5/6 share TWO overlapping 8-grams ("a..h" at 0 and "b..i" at 1)
    // -> positions 0..8 covered, not just one window
    val d = docs(
      5L -> "a b c d e f g h i tail5",
      6L -> "a b c d e f g h i tail6")
    val out = Dedup.spanScrub(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(5L) == ((9L, "tail5")))
    assert(out(6L) == ((9L, "tail6")))
  }

  test("contaminationBloom equals the exact contamination composition") {
    // eval docs are doc_id % 19 == 0 (ids 0, 19); trains 1 and 20 share
    // a full 5-gram with an eval doc, the rest are clean
    val d = docs(
      0L -> "alpha beta gamma delta epsilon zeta",
      19L -> "one two three four five six",
      1L -> "alpha beta gamma delta epsilon other words here",
      20L -> "prefix one two three four five suffix",
      2L -> "totally unrelated content with many more words",
      3L -> "another clean document nothing shared at all")
    val exact = Dedup.contamination(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bloom = Dedup.contaminationBloom(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(exact.nonEmpty)
    assert(bloom == exact)
  }

  test("contaminationBloom survives bloom words with bit 63 set") {
    // Regression class: shiftright is an ARITHMETIC shift, so probing
    // bit 63 of a negative bloom word under `(w >> 63) % 2 === 1` reads
    // -1 — a silent false negative that drops truly contaminated docs.
    // A large eval doc densifies the bloom; the training doc repeats it
    // verbatim so its shingles probe every inserted position, including
    // (precondition asserted below) at least one with bit-in-word 63.
    val evalText = (0 until 60).map(i => s"w$i").mkString(" ")
    val d = docs(
      0L -> evalText,
      1L -> evalText,
      2L -> "clean words nothing shared with the eval corpus at all")
    // Precondition: reproduce the probe-hash layout and require that a
    // shared shingle probes bit 63 of some word — else this test can't
    // catch the sign bug and must be re-fixtured.
    val shRows = d.where(col("doc_id") === 0L)
      .select(explode(graft.functions.TextOps.wordShingles(col("text"), 5))
        .as("sh")).distinct()
      .select((0 until 3).map(i => xxhash64(lit(i), col("sh"))): _*)
      .collect()
    var m = 64L
    while (m < shRows.length.toLong * 16) m <<= 1
    val probed = shRows.flatMap(r => (0 until 3).map(i =>
      ((r.getLong(i) % m) + m) % m))
    assert(probed.exists(_ % 64 == 63),
      "fixture no longer probes a bit-63 position; enlarge the eval doc")
    val exact = Dedup.contamination(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bloom = Dedup.contaminationBloom(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(exact.nonEmpty)
    assert(bloom == exact)
  }

  test("leakSplit: every near-dup cluster lands on one side of the split") {
    // 1~2~3 form one near-dup chain (1,2 identical; 2,3 near); 9 is
    // clean — whatever sides are drawn, cluster members must agree.
    val d = docs(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h i j",
      3L -> "a b c d e f g h i k",
      9L -> "totally different content with many other words")
    val out = Dedup.leakSplit(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 9L))
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(1L)._1 == 1L) // min-label representative
    assert(out.values.forall(v => v._2 == "train" || v._2 == "val"))
  }

  test("profile counts rows, non-nulls and distincts per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")),
      (Some(2L), None), (None, Some("b"))
    ).toDF("k", "s")
    val out = graft.operators.Profile.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("k") == ((4L, 3L, 2L)))
    assert(out("s") == ((4L, 3L, 2L)))
  }

  test("funnel enforces strict stage ordering per user") {
    // u1 converts fully in order; u2 purchases BEFORE clicking (stage
    // 3 must not count); u3 clicks without ever viewing (stage 2 must
    // not count); u4 views only.
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "view", 10L), (2L, "purchase", 15L), (2L, "click", 20L),
      (3L, "click", 5L),
      (4L, "view", 7L)
    ).toDF("user_id", "event_type", "ts")
    val out = graft.relational.RelQueries.funnelOf(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("1_view" -> 3L, "2_click" -> 2L, "3_purchase" -> 1L))
  }

  test("word familiarity: df counts distinct docs, ratios exact") {
    val d = docs(1L -> "a b c", 2L -> "a b", 3L -> "a x")
    val out = TextAnalysis.wordFamiliarity(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // df: a=3 b=2 c=1 x=1; minDf=3 → only 'a' is familiar; corpus n=3.
    // Out-of-cut words (df < minDf) clamp to df = 1 in the mean — the
    // broadcastable-vocabulary contract (b's true df 2 reads as 1)
    assert(out(1L) == ((3L, 333333L, 555555L))) // sum_df 3+1+1 / (3·3)
    assert(out(2L) == ((2L, 500000L, 666666L))) // sum_df 3+1 / (2·3)
    assert(out(3L) == ((2L, 500000L, 666666L))) // sum_df 3+1 / (2·3)
  }

  test("paragraph dedup: shared blocks flag the LATER doc, within-doc repeats don't") {
    val par1 = (1 to 16).map(i => s"p$i").mkString(" ")   // shared block
    val par2 = (21 to 36).map(i => s"q$i").mkString(" ")  // unique to doc 2
    val d = docs(
      1L -> s"$par1 $par1",        // doc 1: the block twice (canonical)
      2L -> s"$par1 $par2",        // doc 2: block copied from doc 1 + own
      3L -> (41 to 56).map(i => s"r$i").mkString(" "))
    val out = Dedup.paragraphDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ((2L, 0L, 0L)), "within-doc repeat is not a dup")
    assert(out(2L) == ((2L, 1L, 500000L)), "cross-doc copy flags the later doc")
    assert(out(3L) == ((1L, 0L, 0L)))
  }

  test("url normalization: lowercases, strips utm_* and fragment, keeps the rest") {
    val d = Seq(
      (1L, "HTTPS://WWW.Example.COM/A/b?utm_source=x&id=7&utm_b=y#frag"),
      (2L, "http://sub.host.ORG/p"),               // no query, no fragment
      (3L, "https://h.io/x?utm_only=1")            // all params stripped
    ).toDF("doc_id", "url")
    val out = TextAnalysis.urlParts(d, "url").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("host"), r.getAs[String]("domain"),
          r.getAs[String]("norm_url"))).toMap
    assert(out(1L) == (("www.example.com", "example.com",
      "https://www.example.com/A/b?id=7")))
    assert(out(2L) == (("sub.host.org", "host.org", "http://sub.host.org/p")))
    assert(out(3L) == (("h.io", "h.io", "https://h.io/x")))
  }

  test("url normalization r6: public suffixes, userinfo, port, dotless hosts") {
    val d = Seq(
      (1L, "https://Shop.Example.co.UK/x"),        // PSL: 3-label domain
      (2L, "https://news.site.com.au/y"),          // PSL: 3-label domain
      (3L, "https://user:pw@h.io:8080/z?a=1"),     // userinfo dropped, port kept
      (4L, "http://LocalHost/admin"),              // dotless: domain = host
      (5L, "https://example.co.uk/")               // bare registrable on PSL
    ).toDF("doc_id", "url")
    val out = TextAnalysis.urlParts(d, "url").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("host"), r.getAs[String]("port"),
          r.getAs[String]("domain"), r.getAs[String]("norm_url"))).toMap
    assert(out(1L) == (("shop.example.co.uk", "", "example.co.uk",
      "https://shop.example.co.uk/x")))
    assert(out(2L) == (("news.site.com.au", "", "site.com.au",
      "https://news.site.com.au/y")))
    assert(out(3L) == (("h.io", "8080", "h.io", "https://h.io:8080/z?a=1")))
    assert(out(4L) == (("localhost", "", "localhost", "http://localhost/admin")))
    // host is already the bare registrable: 3-label extract returns it
    assert(out(5L) == (("example.co.uk", "", "example.co.uk",
      "https://example.co.uk/")))
  }

  test("url dedup: canonical form collapses case/utm/fragment variants, first doc wins") {
    val d = Seq(
      (1L, "https://a.io/p?utm_s=1#x"),
      (2L, "HTTPS://A.IO/p?utm_s=2#y"),   // same canonical as 1
      (3L, "https://a.io/p?q=1"),          // kept param -> distinct
      (4L, "https://a.io/p?q=1#z")         // same canonical as 3
    ).toDF("doc_id", "url")
    val out = Dedup.urlDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((1L, 0L)) && out(2L) == ((1L, 1L)))
    assert(out(3L) == ((3L, 0L)) && out(4L) == ((3L, 1L)))
  }

  test("substring dedup: sliding grams catch SHIFTED duplication, short docs get zero windows") {
    val stolen = (1 to 8).map(i => s"w$i").mkString(" ") // an 8-word run
    val d = docs(
      1L -> s"intro $stolen outro",            // canonical owner (10 words)
      2L -> s"x y z $stolen",                  // same run, different offset
      3L -> "totally different words here only aa bb cc dd",
      4L -> "short doc")                        // < 8 words -> no windows
    val out = Dedup.substringDup(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 0L)))  // 10 words -> 3 windows, none dup
    // doc 2: 11 words -> 4 windows; exactly one (the stolen run) is dup
    assert(out(2L) == ((4L, 1L)))
    assert(out(3L)._2 == 0L)
    assert(out(4L) == ((0L, 0L)))
  }

  test("audio resample: 4:1 block-mean decimation matches the brute " +
    "force on real decoded samples; floor-div on negative blocks") {
    import graft.operators.{AudioCodec, Multimodal}
    val ids = Seq(0L, 1L, 2L, 3L, 5L, 13L) // 8/16-bit, 1/2ch, corrupt 0+13
    val d = ids.map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val got = Multimodal.audioResample(d)(spark).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    ids.foreach { id =>
      if (id % 13 == 0) assert(got(id) == (("unknown", -1L, -1L, -1L, -1L)))
      else {
        val vs = AudioCodec.parseWavSamples(AudioCodec.wavBytes(
          8000 + (id % 5).toInt * 4000, 1 + (id % 2).toInt,
          if (id % 3 == 0) 8 else 16, 100 + (id % 400).toInt,
          seed = id)).get._2
        val rv = vs.grouped(4).filter(_.length == 4)
          .map(g => Math.floorDiv(g.map(_.toLong).sum, 4L)).toSeq
        val want = ("wav", rv.size.toLong, rv.map(math.abs).max,
          rv.map(math.abs).sum / rv.size,
          rv.zipWithIndex.map { case (v, j) => (j + 1L) * v }.sum)
        assert(got(id) == want, s"doc $id")
        assert(rv.exists(_ < 0), s"doc $id: no negative block exercised")
      }
    }
  }

  test("audio zcr: sign changes and lag-1 product sum match the " +
    "brute force on real decoded samples") {
    import graft.operators.{AudioCodec, Multimodal}
    val ids = Seq(0L, 1L, 2L, 3L, 5L, 13L)
    val d = ids.map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val got = Multimodal.audioZcr(d)(spark).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    ids.foreach { id =>
      if (id % 13 == 0) assert(got(id) == (("unknown", -1L, -1L, -1L, -1L)))
      else {
        val vs = AudioCodec.parseWavSamples(AudioCodec.wavBytes(
          8000 + (id % 5).toInt * 4000, 1 + (id % 2).toInt,
          if (id % 3 == 0) 8 else 16, 100 + (id % 400).toInt,
          seed = id)).get._2
        val zc = vs.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
        val ac1 = vs.sliding(2).map(p => p(0).toLong * p(1)).sum
        val want = ("wav", vs.length.toLong, zc.toLong,
          zc.toLong * 1000000L / (vs.length - 1), ac1)
        assert(got(id) == want, s"doc $id")
        assert(zc > 0, s"doc $id: no sign change exercised")
      }
    }
  }

  test("gopher rules: each rule fires independently on a constructed violation") {
    val okWords = (1 to 60).map(i => s"word$i").mkString(" ") + " the the"
    val d = docs(
      1L -> okWords,                                    // passes all
      2L -> "too short the the",                        // word-count rule
      3L -> ((1 to 60).map(_ => "a").mkString(" ") + " the the"), // mean len < 3
      4L -> ((1 to 60).map(i => s"w$i ###").mkString(" ") + " the the"), // symbols
      5L -> ((1 to 60).map(i => s"11$i").mkString(" ") + " 0 0"), // no alpha, no stops
      6L -> (okWords + " pad\n- bullet\n- bullet\n- bullet")) // bullets but <= 90%
    val out = TextAnalysis.gopherRules(d).collect().map(r =>
      r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(7), r.getLong(8), r.getLong(9))).toMap
    // (ok_word_count, ok_word_len, ok_symbol, ok_alpha, ok_stop, pass)
    assert(out(1L) == ((1L, 1L, 1L, 1L, 1L, 1L)))
    assert(out(2L)._1 == 0L && out(2L)._6 == 0L)
    assert(out(3L)._2 == 0L)
    assert(out(4L)._3 == 0L)
    assert(out(5L)._4 == 0L && out(5L)._5 == 0L)
    assert(out(6L)._6 == 1L) // 3 of 4 lines bulleted = 75% <= 90%
  }

  test("c4 rules: line filter, sentence gate, and boilerplate flags " +
    "each fire on a constructed violation; clean_md5 pins content") {
    val goodLine = "this line has enough words and ends well."
    val goodDoc = (1 to 5).map(_ => goodLine).mkString("\n")
    val d = docs(
      1L -> goodDoc,                                // passes: 5 kept lines
      2L -> (goodDoc + "\nno terminal punct here"), // 1 line dropped
      3L -> (goodDoc + "\nshort one."),             // < 3 words dropped
      4L -> (goodLine + "\n" + goodLine),           // only 2 sentences
      5L -> (goodDoc + "\nLorem Ipsum dolor sit."), // boilerplate flag
      6L -> (goodDoc + "\nvar x = { 1 };"))         // code flag
    val out = TextAnalysis.c4Rules(d).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getString(7), r.getLong(8))).toMap
    // (n_lines, n_kept, n_sentences, has_lorem, has_brace, md5, pass)
    assert(out(1L) == ((5L, 5L, 5L, 0L, 0L,
      java.security.MessageDigest.getInstance("MD5")
        .digest(goodDoc.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, 1L)))
    assert(out(2L)._1 == 6L && out(2L)._2 == 5L && out(2L)._7 == 1L)
    assert(out(3L)._2 == 5L, "a 2-word line must be dropped")
    // dropped lines leave the cleaned text equal to doc 1's
    assert(out(2L)._6 == out(1L)._6 && out(3L)._6 == out(1L)._6)
    assert(out(4L)._3 == 2L && out(4L)._7 == 0L, "sentence gate")
    assert(out(5L)._4 == 1L && out(5L)._7 == 0L, "lorem flag is case-blind")
    assert(out(6L)._5 == 1L && out(6L)._7 == 0L, "brace flag")
  }

  test("bmp decode: bottom-up BGR padded file layout maps to " +
    "canonical top-down RGB; corrupt and non-24bpp payloads reject") {
    import graft.operators.ImageCodec
    // 2x2, canonical sample i = i*10 (all 12 samples distinct)
    val bytes = ImageCodec.bmpBytes(2, 2, i => i * 10)
    // stride for w=2 is 8 (6 data bytes + 2 pad): file = 54 + 2*8
    assert(bytes.length == 54 + 16)
    val img = ImageCodec.parseBmp(bytes).get
    assert(img.width == 2 && img.height == 2)
    // decode returns canonical order exactly
    assert(img.raster.map(_ & 0xff).toSeq == (0 until 12).map(_ * 10))
    // and the FILE is genuinely re-ordered: its first raster byte is
    // the BLUE channel of the canonical SECOND row's first pixel
    // (bottom-up rows, BGR channels) = sample 8 = 80
    assert((bytes(54) & 0xff) == 80)
    // truncation mid-raster rejects (the DLT arm)
    assert(ImageCodec.parseBmp(java.util.Arrays.copyOf(bytes, 60)).isEmpty)
    // palette/compressed variants reject
    val bad8 = bytes.clone; bad8(28) = 8
    assert(ImageCodec.parseBmp(bad8).isEmpty)
    val badRle = bytes.clone; badRle(30) = 1
    assert(ImageCodec.parseBmp(badRle).isEmpty)
  }

  test("cdc chunking: boundaries are content-defined — prepending " +
    "text never re-frames chunks after the first boundary; tokens conserved") {
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val shifted = "prefix alpha beta " + base
    val d = docs(1L -> base, 2L -> shifted)
    val out = TextAnalysis.cdcChunk(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val a = out.filter(_._1 == 1L).sortBy(_._2)
    val b = out.filter(_._1 == 2L).sortBy(_._2)
    // conservation: chunk sizes sum to the token count
    assert(a.map(_._3).sum == 200L && b.map(_._3).sum == 203L)
    assert(a.length >= 3, s"mask must cut several chunks, got ${a.length}")
    // the CDC law (vs fixed windows, where a 3-token prepend re-frames
    // EVERYTHING): every chunk of the base doc except its first
    // reappears byte-identical in the shifted doc
    val bSet = b.map(_._4).toSet
    a.drop(1).foreach { case (_, cid, _, h) =>
      assert(bSet.contains(h), s"base chunk $cid lost after prepend")
    }
    // and chunk_ids are dense 0..k-1 in emission order
    assert(a.map(_._2).toSeq == a.indices.map(_.toLong).toSeq)
  }

  test("tiff decode: the same logical header parses identically " +
    "under II and MM byte orders; corrupt variants reject") {
    import graft.operators.ImageCodec
    val le = ImageCodec.tiffBytes(640, 480, 3, bigEndian = false)
    val be = ImageCodec.tiffBytes(640, 480, 3, bigEndian = true)
    assert(!le.sameElements(be), "byte orders must differ on disk")
    val mle = ImageCodec.parseTiff(le).get
    val mbe = ImageCodec.parseTiff(be).get
    assert(mle.format == "tiff_le" && mbe.format == "tiff_be")
    assert((mle.width, mle.height, mle.channels) == ((640L, 480L, 3L)))
    assert((mbe.width, mbe.height, mbe.channels) == ((640L, 480L, 3L)))
    // truncation mid-IFD rejects (the DLT arm)
    assert(ImageCodec.parseTiff(java.util.Arrays.copyOf(le, 20)).isEmpty)
    // bad magic rejects
    val bad = le.clone; bad(0) = 'X'
    assert(ImageCodec.parseTiff(bad).isEmpty)
    // declaring MM over LE-encoded fields breaks the 42 check —
    // proof the decoder honors the declared order, not a guess
    val mixed = le.clone; mixed(0) = 'M'; mixed(1) = 'M'
    assert(ImageCodec.parseTiff(mixed).isEmpty)
  }

  test("gopher ablation: unique kills separate from shared kills " +
    "on constructed violations") {
    val okWords = (1 to 60).map(i => s"word$i").mkString(" ") + " the the"
    val d = docs(
      1L -> okWords,                        // passes all
      2L -> "too short the the",            // fails ONLY word-count
      3L -> ((1 to 60).map(_ => "9").mkString(" ") + " 0 0"))
    // doc 3 fails word-len (mean 1), alpha and stop together
    val out = TextAnalysis.gopherAblation(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("ok_word_count") == ((1L, 1L)), "doc 2 is a unique kill")
    assert(out("ok_word_len")._1 == 1L && out("ok_word_len")._2 == 0L,
      "doc 3's word-len fail is shared, not unique")
    assert(out("ok_alpha")._1 == 1L && out("ok_alpha")._2 == 0L)
    assert(out("ok_symbol") == ((0L, 0L)))
  }

  test("gif decode: version, dims and packed-byte palette round-trip; " +
    "palette-absent and corrupt arms handled") {
    import graft.operators.ImageCodec
    val g89 = ImageCodec.parseGif(
      ImageCodec.gifBytes(320, 200, version89 = true, paletteExp = 7)).get
    assert(g89 == ImageCodec.GifMeta("gif89", 320L, 200L, 256L))
    val g87 = ImageCodec.parseGif(
      ImageCodec.gifBytes(64, 32, version89 = false, paletteExp = 0)).get
    assert(g87 == ImageCodec.GifMeta("gif87", 64L, 32L, 2L))
    // GCT flag clear -> palette 0
    val noPal = ImageCodec.parseGif(
      ImageCodec.gifBytes(10, 10, version89 = true, paletteExp = -1)).get
    assert(noPal.palette == 0L)
    // truncation mid-LSD and bad signature reject
    val full = ImageCodec.gifBytes(10, 10, version89 = true, paletteExp = 2)
    assert(ImageCodec.parseGif(java.util.Arrays.copyOf(full, 9)).isEmpty)
    val bad = full.clone; bad(4) = '8'
    assert(ImageCodec.parseGif(bad).isEmpty)
  }

  test("markov transitions: counts and ppm match a driver-side " +
    "rebuild from per-user ordered event sequences") {
    val ev = graft.relational.Tables
      .events(spark, "/root/testdata/sf0.001")
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val pairs = ev.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val ordered = rs.sortBy(t => (t._4, t._2)).map(_._3)
      ordered.sliding(2).collect { case Array(a, b) => (a, b) }
    }
    val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val prevTotals = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expect = counts.map { case ((p, nx), n) =>
      (p, nx, n, n * 1000000L / prevTotals(p))
    }.toSet
    val got = graft.relational.RelQueries
      .markovTransitions(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("lm buckets: per-language tertiles are balanced nearest-rank " +
    "splits ordered by score") {
    val rows = (1L to 9L).map(i =>
      (i, ("common words " * i.toInt).trim, "en")) ++
      (10L to 13L).map(i => (i, s"rare$i solo$i", "de"))
    val d = rows.toDF("doc_id", "text", "lang")
    val out = TextAnalysis.lmBuckets(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val en = out.filter(_._2 == "en")
    assert(en.count(_._4 == "tail") == 3 && en.count(_._4 == "middle") == 3
      && en.count(_._4 == "head") == 3, s"en split: ${en.toSeq}")
    // buckets respect score order: no tail doc outscores a head doc
    assert(en.filter(_._4 == "tail").map(_._3).max
      <= en.filter(_._4 == "head").map(_._3).min)
    // n=4 language: nearest-rank tertiles give 2/1/1
    val de = out.filter(_._2 == "de")
    assert(de.count(_._4 == "tail") == 2 && de.count(_._4 == "middle") == 1
      && de.count(_._4 == "head") == 1, s"de split: ${de.toSeq}")
  }

  test("cdc dedup: a shifted copy of another doc's text shares its " +
    "interior chunks; an exact copy is fully dup; unique text is clean") {
    val base = (1 to 300).map(i => s"tok$i").mkString(" ")
    val d = docs(
      1L -> base,
      2L -> base,                         // exact copy: every chunk dup
      3L -> ("unrelated preamble " + base), // shifted copy
      4L -> (301 to 500).map(i => s"tok$i").mkString(" ")) // unique
    val out = graft.operators.Dedup.cdcDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // doc 1 owns every chunk (min doc wins): zero dup
    assert(out(1L)._2 == 0L)
    // doc 2 is byte-identical: every chunk is a dup of doc 1's
    assert(out(2L)._1 == out(1L)._1 && out(2L)._2 == out(2L)._1 &&
      out(2L)._3 == 1000000L)
    // doc 3: all chunks after its first boundary re-align with doc 1
    // (the CDC property) -> at most 2 of its chunks are NOT dups
    // (the prefix-absorbing first chunk and possibly a short tail)
    assert(out(3L)._2 >= out(3L)._1 - 2,
      s"shifted copy should be nearly all dup: ${out(3L)}")
    assert(out(3L)._2 > 0L)
    // unique text: no dups
    assert(out(4L)._2 == 0L)
  }

  test("range search returns exactly the in-radius pairs, symmetric in the corpus scan") {
    val vecs = Seq(
      0L -> Array(1.0f, 0.0f, 0.0f, 0.0f),   // query
      1L -> Array(0.9f, 0.1f, 0.0f, 0.0f),   // close to q0
      2L -> Array(0.0f, 1.0f, 0.0f, 0.0f),   // orthogonal
      3L -> Array(-1.0f, 0.0f, 0.0f, 0.0f))  // opposite
    val d = vecs.toDF("vec_id", "embedding")
    val out = Similarity.rangeSearch(d, nQueries = 1, minCosPpm = 300000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 1L))) // only the near vector is in radius
  }

  test("temperature sampling: smallest language keeps everything, rates fall with size") {
    val rows = (1L to 100L).map(i => (i, "w", if (i <= 4) "small" else "big"))
    val d = rows.toDF("doc_id", "text", "lang")
    val out = TextAnalysis.sampleTemperature(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byLang = out.groupBy(_._2)
    // rate(small) = floor(1e6·√(4/4)) = 1e6 → every hash < 1e6 → all kept
    assert(byLang("small").map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    // rate(big) = floor(1e6·√(4/96)) = 204124 ppm — all emitted rows
    // carry the rate, and roughly that fraction of big survives
    assert(byLang("big").forall(_._3 == 204124L))
    assert(byLang("big").size < 50, "big language must be downsampled")
  }

  test("fertility: single-char words are one token each -> fertility 1e6") {
    val d = docs(1L -> "a b a b", 2L -> "a a a")
    val out = graft.operators.Bpe.fertility(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ((4L, 4L, 1000000L)))
    assert(out(2L) == ((3L, 3L, 1000000L)))
  }

  test("kmeans outliers: the planted far point is flagged, tight cluster kept") {
    // two tight clusters + one outlier near cluster 0 (moderate — a
    // huge outlier would drag the floor-mean centroid onto itself and
    // become a singleton cluster, which the rank contract rightly
    // does not flag)
    val vecs = Seq(
      0L -> Array(1.0f, 0.0f), 1L -> Array(0.0f, 1.0f), // seeds k=2
      2L -> Array(1.1f, 0.1f), 3L -> Array(0.9f, 0.05f),
      4L -> Array(0.1f, 1.1f), 5L -> Array(0.05f, 0.9f),
      6L -> Array(3.0f, 0.0f) // planted outlier, stays in cluster 0
    )
    val d = vecs.map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val out = graft.operators.Cluster.kmeansOutliers(d, k = 2, keepFrac = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(6L) == 1L, "planted far point must be flagged")
    assert(Seq(0L, 2L, 3L).forall(out(_) == 0L),
      "tight cluster-0 members stay")
    // per-cluster rank contract: cluster 1 (3 members) flags exactly
    // its farthest member at keepFrac 0.7 (percent_ranks 0, .5, 1)
    assert(Seq(1L, 4L, 5L).map(out).count(_ == 1L) == 1)
    // native path agrees
    val nat = graft.operators.Cluster
      .kmeansOutliers(d, k = 2, keepFrac = 0.7, literalArgminMaxK = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(nat == out)
  }

  test("embedding incremental: batch near-dup of a corpus vector rejected, novel admitted") {
    // 16-dim so the 4×4 sign bands have bits to read. Corpus = vecs
    // 1, 2 (both the alternating pattern); batch (vec_id % 10 == 7):
    // vec 7 is a near-copy of corpus vec 1, vec 17 is the
    // blockwise-orthogonal pattern (dot = 0 against the corpus —
    // below any threshold, so it must admit even if a bucket collides)
    val near = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val nearish = near.clone(); nearish(0) = 0.9f
    val ortho = Array.tabulate(16)(i => if (i % 4 < 2) 1.0f else -1.0f)
    val d = Seq(1L -> near, 2L -> near.map(_ * 2.0f),
      7L -> nearish, 17L -> ortho).toDF("vec_id", "embedding")
    val out = Dedup.embeddingIncremental(d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(7L, 17L), "only batch vectors are labeled")
    assert(out(7L)._1 >= 1L && out(7L)._2 == 0L, "near-dup must not admit")
    assert(out(17L) == ((0L, 1L)), "novel vector admits with zero matches")
  }

  test("expectations: violations counted per check in one scan, pass flag exact") {
    val d = Seq((1L, 10.0), (2L, -3.0), (3L, 200.0)).toDF("id", "v")
    val out = graft.operators.Profile.expectations(d, Seq(
      "id_not_null" -> col("id").isNull,
      "v_nonneg" -> (col("v") < 0),
      "v_le_100" -> (col("v") > 100)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("id_not_null") == ((3L, 0L, 1L)))
    assert(out("v_nonneg") == ((3L, 1L, 0L)))
    assert(out("v_le_100") == ((3L, 1L, 0L)))
    // one scan: a k-check report must not plan k aggregates over the source
    val plan = graft.operators.Profile.expectations(d, Seq(
      "a" -> (col("v") < 0), "b" -> (col("v") > 100)))
      .queryExecution.optimizedPlan.toString
    assert("LocalRelation|LogicalRDD".r.findAllIn(plan).size <= 1)
  }

  test("containment surfaces short-in-long duplication that jaccard dilutes") {
    val longText = (1 to 300).map(i => s"w$i").mkString(" ")
    val shortText = (101 to 110).map(i => s"w$i").mkString(" ") // ⊂ longText
    val d = docs(1L -> longText, 2L -> shortText, 3L -> "x y z q r s")
    val cont = Dedup.containment(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // all 8 of the short doc's 3-gram shingles sit inside the long doc
    assert(cont.toSeq == Seq((1L, 2L, 1000000L)))
    // symmetric jaccard on the same pair: 8 / 298 ≈ 2.7% — invisible
    val jac = Dedup.ngramJaccard(d).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("retention: cohort = first-seen day, offsets distinct per user") {
    val day = 86400L * 1000000000L
    // u1 first day 0, active days 0/1/3 (day-1 twice — must count
    // once); u2 first day 1; u3 day 0 only
    val ev = Seq(
      (1L, 0L), (1L, day + 5L), (1L, day + 9L), (1L, 3 * day),
      (2L, day), (3L, 7L)
    ).toDF("user_id", "ts")
    val out = graft.relational.RelQueries.retentionOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L))
  }

  test("distributed-build bloom contamination equals the driver-build one") {
    // eval docs are doc_id % 19 == 0; give one corpus doc a real
    // 5-gram overlap with doc 0 and another none
    val d = docs(
      0L -> "alpha beta gamma delta epsilon zeta",
      19L -> "one two three four five six",
      3L -> "alpha beta gamma delta epsilon other tail",
      4L -> "unrelated words entirely disjoint from eval set")
    val a = Dedup.contaminationBloom(d).collect().toSeq
    val b = Dedup.contaminationBloomDist(d).collect().toSeq
    val c = Dedup.contamination(d).collect().toSeq
    assert(a == c && b == c)
    assert(c.map(r => r.getLong(0)) == Seq(3L))
  }

  test("ivf-pq is exact when every vector is a codebook entry") {
    // vectors 0..15 ARE the PQ samples; 16..19 duplicate 0..3 — every
    // sub-vector argmin reconstructs its input exactly (‖c−x‖² = 0
    // uniquely), so ADC degenerates to the exact dot and every
    // returned score must equal brute force.
    val vecs = (0L to 15L).map(i =>
      (i, Array.tabulate(16)(d => math.cos(i * 7 + d).toFloat).toSeq)) ++
      (16L to 19L).map(i => (i,
        Array.tabulate(16)(d => math.cos((i - 16) * 7 + d).toFloat).toSeq))
    val e = vecs.toDF("vec_id", "embedding")
    val brute = Similarity.knnBrute(e, nQueries = 4, k = 20).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3))).toMap
    val pq = Similarity.knnIvfPq(e, nQueries = 4, k = 5,
      nCentroids = 4, nProbe = 2, nSub = 4, nCodes = 16).collect()
    assert(pq.nonEmpty)
    pq.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 5)
      val key = (r.getLong(0), r.getLong(2))
      assert(brute.contains(key) && brute(key) == r.getLong(3),
        s"pq scored $key differently from brute force")
    }
    // the planted duplicate of query 0 must surface at rank 1 (cos of
    // an identical vector is maximal; exact value is floor(1e6·n/
    // (√n·√n)) — 999999 when √n² rounds above n, so compare to brute)
    val dup = pq.find(r => r.getLong(0) == 0L && r.getLong(2) == 16L)
    assert(dup.isDefined && dup.get.getLong(1) == 1L &&
      dup.get.getLong(3) == brute((0L, 16L)))
  }

  test("ivf-pq rerank returns TRUE cosines (exact re-rank of the PQ page)") {
    val e = (0L to 30L).map(i =>
      (i, Array.tabulate(16)(d => math.sin(i * 13 + d * 3).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val brute = Similarity.knnBrute(e, nQueries = 3, k = 31).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3))).toMap
    val out = Similarity.knnIvfPqRerank(e, nQueries = 3, k = 4, page = 10)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      // unlike the PQ stage (approximate scores), every re-ranked row
      // must carry the exact full-precision cosine
      assert(brute.contains(key) && brute(key) == r.getLong(3),
        s"rerank emitted a non-exact score for $key")
    }
  }

  test("trained-PQ fit is rerun-deterministic and emits full result pages") {
    val e = (0L to 40L).map(i =>
      (i, Array.tabulate(16)(d => math.sin(i * 11 + d * 5).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    def run() = Similarity.knnIvfPqTrained(e, nQueries = 3, k = 4,
      nCentroids = 4, nProbe = 2, nSub = 4, nCodes = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val a = run()
    // exact-integer assign + floor(mean) update → bit-identical refit
    assert(a == run())
    assert(a.nonEmpty && a.forall(t => t._2 >= 1 && t._2 <= 4))
    assert(a.map(t => (t._1, t._3)).distinct.size == a.size)
  }

  test("knn ivf returns a subset of brute-force candidates, same scoring") {
    val e = (0L to 20L).map(i =>
      (i, Array.tabulate(16)(d => math.cos(i * 7 + d).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val brute = Similarity.knnBrute(e, nQueries = 2, k = 21).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3))).toMap
    val ivf = Similarity.knnIvf(e, nQueries = 2, k = 5, nCentroids = 4).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(brute.contains(key) && brute(key) == r.getLong(3),
        s"ivf scored $key differently from brute force")
    }
  }

  test("imageNearDup is EXACT at hamming<=3 over hand-made hashes; " +
    "DLT rows excluded; d=4 pairs out of scope") {
    // hashes placed so pairs sit at hamming 0, 1, 3 (caught), 4
    // (excluded by the filter), plus a corrupt-payload -1 row
    val rows = Seq(
      (1L, 0x0L, 0x0FF00L), (2L, 0x0L, 0x0FF00L), // d=0
      (3L, 0x0L, 0x0FF01L), // d=1 vs 1/2
      (4L, 0x0L, 0x0FF07L), // d=3 vs 3 (bits 1,2 added); d=2 vs 1
      (5L, 0x0L, 0x0FF0FL), // d=4 vs 1 — excluded vs 1, d=1 vs 4
      (6L, -1L, -1L), // DLT row: never paired
      (7L, 0xABCD1234L, 0x5EF00000L)) // far from everything
      .toDF("doc_id", "hash_hi", "hash_lo")
    val phash = rows.withColumn("width", lit(8L))
      .withColumn("height", lit(8L)).withColumn("channels", lit(1L))
    val ok = rows.where(col("hash_hi") >= 0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val brute = (for {
      a <- ok.keys; b <- ok.keys if a < b
      h = java.lang.Long.bitCount(ok(a)._1 ^ ok(b)._1) +
        java.lang.Long.bitCount(ok(a)._2 ^ ok(b)._2)
      if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = Dedup.imageNearDup(phash).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.exists(_._3 == 3L), "a d=3 pair must be present")
    assert(!brute.exists(p => p._1 == 6L || p._2 == 6L))
    assert(got == brute)
  }

  test("imagePhash -> imageNearDup on the fixture corpus matches " +
    "brute force; groups yield near-dup pairs") {
    val d = graft.relational.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val ph = graft.operators.Multimodal.imagePhash(d)(spark)
    val hs = ph.collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(hs.values.forall(h => h._1 >= 0 && h._2 >= 0),
      "fixture rasters all decode (no DLT rows)")
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      h = java.lang.Long.bitCount(hs(a)._1 ^ hs(b)._1) +
        java.lang.Long.bitCount(hs(a)._2 ^ hs(b)._2)
      if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = Dedup.imageNearDup(ph).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    // intra-group perturbed variants really do land within hamming 3
    assert(brute.exists { case (a, b, _) => a / 4 == b / 4 },
      "same-group images should pair")
  }

  test("imagePhashOriented normalizes stored rotation: hashes equal " +
    "the UPRIGHT-formula aHash; truncated docs -> DLT rows; " +
    "rotated group members pair under imageNearDup") {
    val d = graft.relational.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val ph = graft.operators.Multimodal.imagePhashOriented(d)(spark)
    val rows = ph.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 13 == 0) {
        // truncated payload: the corrupt-file DLT arm
        assert((1 to 5).forall(i => r.getLong(i) == -1L),
          s"doc $id should be the -1 DLT row")
      } else {
        // recompute the upright raster straight from the fixture
        // formula — the oracle's view, which never sees a rotated byte
        val g = id / 4; val m = id % 4
        val w = (8 + g % 5).toInt; val h = (8 + g % 3).toInt
        val k = 3 + (g % 97)
        val upright = Array.tabulate(w * h)(i =>
          ((i.toLong * k + g * 11 +
            (if (i % 37 == 0) m * 24 else 0)) % 256).toByte)
        val (hi, lo) = graft.operators.ImageCodec
          .averageHash(upright, w, h, 1)
        assert(r.getLong(1) == w && r.getLong(2) == h,
          s"doc $id: normalized dims must be the UPRIGHT dims")
        assert(r.getLong(4) == hi && r.getLong(5) == lo,
          s"doc $id: normalized hash must equal the upright-formula hash")
      }
    }
    // the point of the composition: mutually-ROTATED duplicates pair
    val pairs = Dedup.imageNearDup(ph).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.exists { case (a, b) =>
      a / 4 == b / 4 && (1 + a % 8) != (1 + b % 8) },
      "differently-oriented members of a group must pair after " +
        "normalization")
    assert(pairs.forall { case (a, b) => a % 13 != 0 && b % 13 != 0 })
  }

  test("videoNearDup pairs exactly the planted rotated-render groups: " +
    "every pair is in-group, truncated containers never pair, and " +
    "the signature walk matches a driver-side re-render (r9)") {
    val d = graft.relational.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val sigs = graft.operators.Multimodal.videoFrameSigs(d)(spark)
    // driver-side re-render of the fixture formula + polynomial sig
    val P = 2147483647L
    def frameSig(g: Long, m: Long, f: Long): Long = {
      var sig = 0L; var pw = 1L
      (0 until 8).foreach { i =>
        val pert = if (f % 11 == m) m * 7L + 1L else 0L
        val m1 = (f * 2654435761L + i * 40503L + (g % P) * 2246822519L +
          pert) % P
        val m2 = (f * 40503L + i * 2654435761L + (g % P) * 715827883L +
          pert) % P
        val v = (m1 * m2 % P) % 256
        sig = (sig + v * pw) % P; pw = pw * 257L % P
      }
      sig
    }
    val got = sigs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (id, f, sig) =>
      assert(id % 13 != 0, "truncated containers must emit nothing")
      assert(sig == frameSig(id / 4, id % 4, f),
        s"doc $id frame $f: sig mismatch")
    }
    val pairs = Dedup.videoNearDup(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(a / 4 == b / 4, s"spurious cross-group pair ($a,$b)")
      assert(a % 13 != 0 && b % 13 != 0)
    }
  }

  test("embedBlockerRecall: two blocker rows with count invariants; " +
    "hits bounded by both sides; full-sample recall of the exact " +
    "truth is what the sign bands actually achieve") {
    val e = graft.relational.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
    val rows = Dedup.embedBlockerRecall(e).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("ivf", "signlsh"))
    rows.foreach { r =>
      val (t, c, h) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(h <= t && h <= c, "hits bounded by truth and candidates")
      assert(r.getLong(4) == (if (t == 0) 1000000L else h * 1000000L / t))
      assert(r.getLong(5) == (if (c == 0) 1000000L else h * 1000000L / c))
    }
    // pct=100 → the sample is the corpus: candidate recall must then
    // match embeddingNearDup's own coverage of the exact truth
    val full = Dedup.embedBlockerRecall(e, samplePct = Some(100)).collect()
    assert(full.map(_.getString(0)).toSeq == Seq("ivf", "signlsh"))
    assert(full.forall(_.getLong(1) > 0), "corpus plants true pairs")
  }

  test("kAnonymity flags classes smaller than k; bands floor " +
    "negative balances downward") {
    val q = graft.relational.RelQueries
      .kAnonymity(spark, "/root/testdata/sf0.001").collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      assert((r.getLong(3) < 5) == (r.getLong(4) == 1L))
    }
    // negative acctbal exists in TPC-H; floor puts it in band -1
    assert(q.exists(_.getLong(2) < 0), "negative band present")
  }

  test("modalBand matches a driver-side histogram argmax with the " +
    "stated tiebreak at sf0.001 (r7)") {
    val got = graft.relational.RelQueries
      .modalBand(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val ev = graft.relational.Tables
      .events(spark, "/root/testdata/sf0.001")
      .selectExpr("event_type", "CAST(FLOOR(value / 25.0) AS BIGINT) AS b")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val ref = ev.groupBy(_._1).view.mapValues { rows =>
      rows.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (b, n) => (-n, b) }.head
    }.toSeq.map { case (t, (b, n)) => (t, b, n) }.sortBy(_._1)
    assert(got == ref)
  }

  test("pathTrigrams matches a driver-side per-user walk at sf0.001 " +
    "(r7)") {
    val got = graft.relational.RelQueries
      .pathTrigrams(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    val ev = graft.relational.Tables
      .events(spark, "/root/testdata/sf0.001")
      .selectExpr("user_id", "event_type", "CAST(ts AS BIGINT) AS tsn",
        "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ref = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._3, r._4)).map(_._2).sliding(3)
        .filter(_.length == 3).map(s => (s(0), s(1), s(2)))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy { case (a, b, c, n) => (-n, a, b, c) }.take(20)
    assert(got == ref)
  }

  test("clusterStats: histogram reconciles with the raw cluster " +
    "labels; docs total matches corpus; removable = docs - clusters (r7)") {
    val d = graft.relational.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val labels = Dedup.nearDupClusters(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bySize = labels.groupBy(_._2).values.map(_.size)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Dedup.clusterStats(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(r => (r._1, r._2)).toMap ==
      bySize.map { case (s, n) => (s.toLong, n) })
    assert(got.map(_._3).sum == labels.length.toLong)
    got.foreach { case (s, n, docs2, rem) =>
      assert(docs2 == s * n && rem == (s - 1) * n)
    }
    assert(got.exists(_._1 > 1), "fixture corpus has non-trivial clusters")
  }

  test("skewReport: top keys, shares, and the skew factor match a " +
    "driver-side histogram; flat data scores near 1000 (r7)") {
    val got = graft.relational.RelQueries
      .skewReport(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.length == 5)
    val hist = graft.relational.Tables
      .events(spark, "/root/testdata/sf0.001")
      .select("user_id").collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nRows = hist.values.sum; val nKeys = hist.size.toLong
    val maxN = hist.values.max
    val top = hist.toSeq.sortBy { case (k, n) => (-n, k) }.take(5)
    assert(got.map(r => (r._1, r._2)).toSeq == top)
    got.foreach { case (_, n, share, ks, rows, skew) =>
      assert(ks == nKeys && rows == nRows)
      assert(share == n * 1000000L / nRows)
      assert(skew == maxN * nKeys * 1000L / nRows)
    }
    // generated events are near-uniform per user: skew factor stays
    // in the same decade as flat (1000)
    assert(got.head._6 < 10000L, s"unexpectedly skewed: ${got.head._6}")
  }

  test("lshRecallReport: counts reconcile with the two underlying " +
    "pair sets; ratios are exact integer ppm (r7)") {
    val d = graft.relational.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val truth = Dedup.ngramJaccard(d, minJaccardPpm = 750000L)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashLsh(d).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val Array(row) = Dedup.lshRecallReport(d).collect()
    val (nt, nc, nh) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nt == truth.size && nc == cand.size)
    assert(nh == (truth intersect cand).size)
    assert(row.getLong(3) == (if (nt == 0) 1000000L else nh * 1000000L / nt))
    assert(row.getLong(4) == (if (nc == 0) 1000000L else nh * 1000000L / nc))
    assert(nt > 0, "fixture corpus has planted near-dups")
  }

  test("df-capped exact verify: a boilerplate shingle shared by " +
    "> maxDf docs is dropped whole; rare-run pairs survive (r8)") {
    // Every doc ends in the same 5-word boilerplate tail (3 shingles
    // at df = 59 > cap); docs 1 and 2 share a RARE 6-word run (4
    // shingles at df = 2). Under the cap the boilerplate universe
    // disappears: the 1,600+ boilerplate-only pairs vanish and the
    // one real pair scores HIGHER (the everyone-has-it noise no
    // longer dilutes doc 1's set size).
    val d = docs(((3L to 60L).map(i =>
      i -> s"u$i v$i w$i x$i y$i z$i the quick brown fox jumps") ++ Seq(
      1L -> "zeta eta theta iota kappa lambda the quick brown fox jumps",
      2L -> "zeta eta theta iota kappa lambda over the lazy dog today")): _*)
    val capped = Dedup.ngramJaccardCapped(d, minJaccardPpm = 0L,
      maxDf = 50).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4)))
    assert(capped.length == 1, "boilerplate-only pairs must vanish")
    assert(capped.head._1 == (1L, 2L))
    // doc1 keeps 6 capped shingles, doc2 all 9; 4 shared:
    // floor(4e6 / (6 + 9 - 4)) = 363636
    assert(capped.head._2 == 363636L)
    val uncapped = Dedup.ngramJaccard(d, minJaccardPpm = 0L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(uncapped((1L, 2L)) == 285714L) // floor(4e6 / (9 + 9 - 4))
    assert(uncapped.size > 1600, "uncapped joins every boilerplate pair")
    // a cap that doesn't bite is the identity on both measures
    val wide = Dedup.ngramJaccardCapped(d, minJaccardPpm = 0L,
      maxDf = 1000).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(wide == uncapped)
    val cWide = Dedup.containmentCapped(d, minContainPpm = 0L,
      maxDf = 1000).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    val cUn = Dedup.containment(d, minContainPpm = 0L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    assert(cWide == cUn)
  }

  /** Driver-side restatement of the portable salted recall sample. */
  private def inRecallSample(id: Long): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"recall:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16) % 2147483647L % 100 < 30
  }

  test("lshRecallSampled: counts reconcile with a driver-side " +
    "sampled truth and both-ends-sampled candidate set (r8)") {
    val d = graft.relational.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val nDocs = d.count()
    val sampIds = d.select("doc_id").collect().map(_.getLong(0))
      .filter(inRecallSample).toSet
    assert(sampIds.nonEmpty && sampIds.size * 2 < nDocs,
      s"~30% sample expected, got ${sampIds.size} of $nDocs")
    val truth = Dedup.ngramJaccard(
        d.where(col("doc_id").isInCollection(sampIds)),
        minJaccardPpm = 750000L)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashLsh(d).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => sampIds(p._1) && sampIds(p._2)).toSet
    val Array(row) = Dedup.lshRecallSampled(d).collect()
    val (nt, nc, nh) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nt == truth.size && nc == cand.size)
    assert(nh == (truth intersect cand).size)
    assert(row.getLong(3) == (if (nt == 0) 1000000L else nh * 1000000L / nt))
    assert(row.getLong(4) == (if (nc == 0) 1000000L else nh * 1000000L / nc))
  }

  test("blockerRecallReport: one row per blocker against one shared " +
    "truth; hit counts bounded by both sides (r8)") {
    val d = graft.relational.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val rows = Dedup.blockerRecallReport(d).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("minhash", "oph", "snm", "winnow"))
    val truths = rows.map(_.getLong(1)).distinct
    assert(truths.length == 1 && truths.head > 0,
      "all blockers score against the SAME sampled truth")
    rows.foreach { r =>
      val (nt, nc, nh) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nh <= math.min(nt, nc))
      assert(r.getLong(4) == (if (nt == 0) 1000000L else nh * 1000000L / nt))
      assert(r.getLong(5) == (if (nc == 0) 1000000L else nh * 1000000L / nc))
    }
  }

  test("knnBitsig matches a driver-side sign-signature Hamming " +
    "top-k at sf0.001 (r7)") {
    val emb = graft.relational.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
    val vecs = emb.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray)
    }
    val sigs = vecs.map { case (id, v) =>
      id -> (0 until 64).map(i => if (v(i) > 0.0f) 1L << i else 0L).sum
    }.toMap
    val ref = sigs.keys.filter(_ < 8).toSeq.sorted.flatMap { q =>
      sigs.toSeq.filter(_._1 != q)
        .map { case (id, s) =>
          (id, java.lang.Long.bitCount(sigs(q) ^ s).toLong)
        }
        .sortBy { case (id, h) => (h, id) }.take(5).zipWithIndex
        .map { case ((id, h), i) => (q, (i + 1).toLong, id, h) }
    }
    val got = graft.operators.Similarity.knnBitsig(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == ref)
  }

  test("seasonality: per-type counts and flat-week ppm indexes " +
    "reconcile; weekday from pure epoch math (r7)") {
    val got = graft.relational.RelQueries
      .seasonality(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, dow, n, _) =>
      assert(dow >= 0 && dow <= 6 && n > 0)
    }
    got.groupBy(_._1).values.foreach { rows =>
      val tot = rows.map(_._3).sum
      rows.foreach { case (_, _, n, ppm) =>
        assert(ppm == n * 7L * 1000000L / tot)
      }
      // floor ppm sums land within |rows| of exactly 7e6
      val s = rows.map(_._4).sum
      assert(s <= 7000000L && s > 7000000L - 7 * rows.length)
    }
  }

  test("erMatch: matches a driver-side blocked-Levenshtein " +
    "recomputation; finds the cold/old landmark pair (r7)") {
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.relational.RelQueries.erMatch(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
      .toSeq
    assert(got.nonEmpty)
    assert(got.contains(("cold bolt", "old bolt", 1L)))
    // driver-side reference: same vocabulary, same noun block, same
    // threshold, classic DP distance
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_name").distinct().collect().map(_.getString(0))
    val byNoun = names.groupBy(_.split(" ").last)
    val ref = byNoun.values.flatMap { blk =>
      for {
        a <- blk.toSeq; b <- blk.toSeq if a < b
        d = lev(a, b) if d <= 2
      } yield (a, b, d.toLong)
    }.toSeq.sorted
    assert(got.sorted == ref)
  }

  test("winnowPairs: identical docs share their full fingerprint " +
    "set; disjoint-vocab docs never pair; shared runs of w+k-1 " +
    "tokens are detected (r7)") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val run = (1 to 6).map(i => s"r$i").mkString(" ") // w+k-1 = 6 tokens
    val d = docs(
      1L -> base, 2L -> base,                     // identical pair
      3L -> (s"alpha beta gamma delta $run"),     // shares only `run`...
      4L -> (s"eps zeta eta theta iota $run"),    // ...with doc 4
      5L -> "one two three four five six seven")  // disjoint
    val got = Dedup.winnowPairs(d, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val asMap = got.map { case (a, b, n) => (a, b) -> n }.toMap
    val fp1 = TextAnalysis.winnow(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(asMap.contains((1L, 2L)), "identical docs must pair")
    assert(asMap((1L, 2L)) == fp1(1L), "identical docs share ALL fps")
    assert(asMap.contains((3L, 4L)),
      "a shared w+k-1 run must produce a shared fingerprint")
    assert(!got.exists { case (a, b, _) => Set(a, b).contains(5L) },
      "disjoint vocab must not pair")
  }

  test("rfmSegments matches a driver-side quintile recomputation at " +
    "sf0.001; scores stay in [1,5] and segment encodes them (r7)") {
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.relational.RelQueries.rfmSegments(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    assert(got.nonEmpty)
    // driver-side reference
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_custkey",
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000 AS day",
        "CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pc = rows.groupBy(_._1).map { case (k, rs) =>
      (k, rs.map(_._2).max, rs.length.toLong, rs.map(_._3).sum)
    }.toSeq
    val corpusLast = pc.map(_._2).max
    val n = pc.length.toLong
    def th(vs: Seq[Long]): Seq[Long] = {
      val s = vs.sorted
      (1 to 4).map(k => s((((n - 1) * 20 * k) / 100).toInt))
    }
    val feats = pc.map { case (k, last, f, m) => (k, corpusLast - last, f, m) }
    val (rt, ft, mt) = (th(feats.map(_._2)), th(feats.map(_._3)),
      th(feats.map(_._4)))
    def up(v: Long, t: Seq[Long]): Long = t.count(v > _).toLong
    val ref = feats.map { case (k, r, f, m) =>
      val (rs, fs, ms) = (5L - up(r, rt), 1L + up(f, ft), 1L + up(m, mt))
      (k, r, f, m, rs, fs, ms, rs * 100 + fs * 10 + ms)
    }.sortBy(_._1)
    assert(got.toSeq == ref)
    got.foreach { case (_, _, _, _, rs, fs, ms, _) =>
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
    }
  }

  test("abTest: significance flags match an exact BigInt " +
    "recomputation AND the float z-test away from the boundary (r7)") {
    val got = graft.relational.RelQueries
      .abTest(spark, "/root/testdata/sf0.001").collect()
    assert(got.length == 10, "5 types -> 10 unordered pairs")
    got.foreach { r =>
      val (n1, s1, n2, s2) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      val d = BigInt(s1) * n2 - BigInt(s2) * n1
      val n = BigInt(n1 + n2); val s = BigInt(s1 + s2)
      val lhs = d * d * n * 10000
      val rhs = BigInt(38416) * n1 * n2 * s * (n - s)
      assert(r.getLong(8) == (if (lhs > rhs) 1L else 0L))
      // cross-check the algebra against the classical float z-test
      val p1 = s1.toDouble / n1; val p2 = s2.toDouble / n2
      val pp = (s1 + s2).toDouble / (n1 + n2)
      val z2 = (p1 - p2) * (p1 - p2) /
        (pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
      if (math.abs(z2 - 3.8416) > 1e-6)
        assert((z2 > 3.8416) == (r.getLong(8) == 1L),
          s"float z2=$z2 disagrees for ${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("sessionConcurrency matches a driver-side GLOBAL sweep line " +
    "at sf0.001 — the distributed two-level prefix sum is exact (r7)") {
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.relational.RelQueries.sessionConcurrency(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.nonEmpty)
    assert(got.map(_._2).sum == got.map(_._3).sum, "starts == ends")
    // reference: rebuild sessions by 6h-gap islands, run ONE global
    // ordered sweep, take per-hour running-max
    val gapUs = 6L * 3600 * 1000000
    val ev = graft.relational.Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(ts AS BIGINT) div 1000 AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bounds = ev.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.map(_._2).sorted
      val islands = scala.collection.mutable.ArrayBuffer((ts.head, ts.head))
      ts.tail.foreach { t =>
        val (s, e) = islands.last
        if (t - e >= gapUs) islands += ((t, t))
        else islands(islands.length - 1) = (s, t)
      }
      islands.flatMap { case (s, e) => Seq((s, 1L), (e + gapUs, -1L)) }
    }.toSeq.sortBy(b => (b._1, b._2))
    var run = 0L
    val peaks = scala.collection.mutable.Map[Long, Long]()
    bounds.foreach { case (t, d) =>
      run += d
      val h = t / 3600000000L * 3600L
      peaks(h) = math.max(peaks.getOrElse(h, Long.MinValue), run)
    }
    got.foreach { case (h, _, _, peak) =>
      assert(peaks(h) == peak, s"hour $h: got $peak want ${peaks(h)}")
    }
    assert(got.map(_._1).toSet == peaks.keySet)
  }

  test("benfordDigits: reference constants sum to exactly 10^6 and " +
    "the digit histogram matches a driver-side recomputation (r7)") {
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.relational.RelQueries.benfordDigits(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.map(_._4).sum == 1000000L, "Benford ppm must total 10^6")
    val cents = spark.read.parquet(s"$sfDir/orders.parquet")
      .collect().map(r => math.floor(r.getAs[Double]("o_totalprice") * 100).toLong)
      .filter(_ > 0)
    val hist = cents.groupBy(_.toString.head.asDigit.toLong)
      .view.mapValues(_.length.toLong).toMap
    val total = hist.values.sum
    got.foreach { case (d, n, obs, bf, dev) =>
      assert(hist(d) == n, s"digit $d count")
      assert(obs == n * 1000000L / total)
      assert(dev == math.abs(obs - bf))
    }
    assert(got.map(_._2).sum == total)
  }

  test("basketPairs matches a driver-side a-priori recomputation " +
    "at sf0.001 — pruning thresholds, pair counts, integer lift, " +
    "top-100 order") {
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.relational.RelQueries.basketPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty)
    // driver-side reference over the same parquet
    val baskets = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val itemCnt = baskets.groupBy(_._2).view.mapValues(_.length)
      .filter(_._2 >= 20).toMap
    val nOrders = baskets.map(_._1).distinct.length.toLong
    val ref = baskets.filter(b => itemCnt.contains(b._2))
      .groupBy(_._1).values.flatMap { items =>
        val ps = items.map(_._2).sorted
        for (i <- ps.indices; j <- (i + 1) until ps.length)
          yield (ps(i), ps(j))
      }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2)
      .map { case ((p1, p2), n) =>
        (p1, p2, n, n * 1000000L * nOrders / (itemCnt(p1) * itemCnt(p2)))
      }.toSeq
      .sortBy { case (p1, p2, n, _) => (-n, p1, p2) }.take(100)
    assert(got == ref)
    got.foreach { case (p1, p2, n, _) =>
      assert(p1 < p2); assert(n >= 2)
    }
  }

  test("sortedNeighborhood matches a driver-side window walk; " +
    "identical docs are always adjacent and found") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docs((1L to 20L).map { i =>
      i -> (i % 3 match {
        case 0 => base
        case 1 => base.replace("w5", s"x$i")
        case _ => s"unrelated $i " + (1 to 15).map(j => s"q${i}_$j").mkString(" ")
      })
    }: _*)
    val fps = Dedup.simhash(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    // reference: partition by top-8 bits, sort by (fp, id), leads 1..3
    val ref = fps.groupBy(_._2 >> 40).values.flatMap { blk =>
      val sorted = blk.sortBy(x => (x._2, x._1))
      for {
        i <- sorted.indices; o <- 1 to 3 if i + o < sorted.size
        (ida, fa) = sorted(i); (idb, fb) = sorted(i + o)
        h = java.lang.Long.bitCount(fa ^ fb) if h <= 10
      } yield (math.min(ida, idb), math.max(ida, idb), h.toLong)
    }.toSet
    val got = Dedup.sortedNeighborhood(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref)
    // identical docs share a fingerprint -> sort-adjacent -> hamming 0
    val sameFp = fps.filter(_._1 % 3 == 0).map(_._1)
    val idPairs = for (a <- sameFp; b <- sameFp if a < b) yield (a, b)
    // adjacency only guarantees pairs within the window size
    val adjacent = idPairs.filter { case (a, b) =>
      val sorted = sameFp.sorted
      math.abs(sorted.indexOf(a) - sorted.indexOf(b)) <= 3
    }
    adjacent.foreach { case (a, b) =>
      assert(got.contains((a, b, 0L)), s"identical pair ($a,$b) missed")
    }
  }

  test("sStem applies the Harman rules; counts fold the vocabulary") {
    val words = Seq(
      "ponies" -> "pony", "movies" -> "movy", "dogs" -> "dog",
      "churches" -> "churche", "classes" -> "classe",
      "bus" -> "bus", "glass" -> "glass", "eies" -> "eies",
      "aies" -> "aies", "goes" -> "goes", "trees" -> "trees",
      "cat" -> "cat", "s" -> "", "ies" -> "y")
    val d = words.zipWithIndex
      .map { case ((w, _), i) => (i.toLong, w) }
    val got = graft.operators.TextAnalysis.sStem(docs(d: _*)).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    words.zipWithIndex.foreach { case ((w, stem), i) =>
      assert(got(i.toLong) == stem, s"$w should stem to '$stem'")
    }
    // vocabulary fold: dog + dogs in one doc -> 2 distinct, 1 stemmed
    val fold = graft.operators.TextAnalysis
      .sStem(docs(1L -> "dog dogs dog")).collect().head
    assert(fold.getLong(1) == 3 && fold.getLong(2) == 2 &&
      fold.getLong(3) == 1)
  }

  test("valueHistogram: bins match a driver-side reference; " +
    "totals conserved; bins within range") {
    val raw = graft.relational.Tables
      .events(spark, "/root/testdata/sf0.001")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100).toLong))
    val ext = raw.groupBy(_._1).view
      .mapValues(vs => (vs.map(_._2).min, vs.map(_._2).max)).toMap
    val ref = raw.groupBy { case (t, v) =>
      val (mn, mx) = ext(t)
      (t, if (mx == mn) 0L else math.min(9L, (v - mn) * 10 / (mx - mn)))
    }.view.mapValues(_.length.toLong).toMap
    val got = graft.relational.RelQueries
      .valueHistogram(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == ref)
    assert(got.keys.forall { case (_, b) => b >= 0 && b <= 9 })
    assert(got.values.sum == raw.length)
  }

  test("winsorize: nearest-rank bounds and clipped sums match a " +
    "driver-side exact reference") {
    val raw = graft.relational.Tables
      .events(spark, "/root/testdata/sf0.001")
      .select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100).toLong, r.getLong(2)))
    val ref = raw.groupBy(_._1).map { case (t, vs) =>
      val sorted = vs.map(v => (v._2, v._3)).sortBy(identity).map(_._1)
      val n = sorted.size
      val lo = sorted(((n - 1) * 5 / 100).toInt)
      val hi = sorted(((n - 1) * 95 / 100).toInt)
      (t, (n.toLong, sorted.count(_ < lo).toLong,
        sorted.count(_ > hi).toLong,
        sorted.map(v => math.min(math.max(v, lo), hi)).sum))
    }
    val got = graft.relational.RelQueries
      .winsorize(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == ref)
  }

  test("hourlyAnomaly: flags match an independent driver-side exact " +
    "3-sigma reference built from raw events") {
    // independent reference: re-bucket raw events on the driver and
    // evaluate the 3-sigma rule in exact BigInt arithmetic — shares
    // NOTHING with the operator but the events parquet
    val raw = graft.relational.Tables
      .events(spark, "/root/testdata/sf0.001")
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600000000000L * 3600L))
    val counts = raw.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = counts.map { case ((typ, hr), n) =>
      val hs = counts.collect { case ((t, _), c) if t == typ => c }.toSeq
      val nh = BigInt(hs.size)
      val s1 = BigInt(hs.sum)
      val s2 = hs.map(c => BigInt(c) * BigInt(c)).sum
      val dev = nh * n - s1
      (typ, hr, n, if (dev * dev > 9 * (nh * s2 - s1 * s1)) 1L else 0L)
    }.toSet
    val got = graft.relational.RelQueries
      .hourlyAnomaly(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got.nonEmpty)
    assert(got == expect)
  }

  test("hhi matches a driver-side exact-integer recomputation at " +
    "sf0.001; hhi_ppm in [10^6/n, 10^6] (r7)") {
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.relational.RelQueries.hhi(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    val spend = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sum }
    val nk = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val nname = spark.read.parquet(s"$sfDir/nation.parquet")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val byNation = spend.toSeq.groupBy { case (ck, _) => nk(ck) }
    val ref = byNation.map { case (n, cs) =>
      val tot = cs.map(_._2).sum
      val shares = cs.map { case (_, c) => c * 1000000L / tot }
      (nname(n), cs.size.toLong, tot,
        shares.map(s => s * s).sum / 1000000L, shares.max)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == ref)
    got.foreach { case (_, n, _, hhi, top) =>
      assert(hhi <= 1000000L && top <= 1000000L)
      // floor-ppm shares can undershoot the even bound slightly, but
      // never by more than n (one ulp per customer)
      assert(hhi >= 1000000L / n - n)
    }
  }

  test("interarrival matches a driver-side per-(type, day) gap walk " +
    "at sf0.001; gaps are non-negative (r7)") {
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.relational.RelQueries.interarrival(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    val nd = 86400L * 1000000000L
    val ev = graft.relational.Tables.events(spark, sfDir)
      .selectExpr("event_type", "event_id", "CAST(ts AS BIGINT) AS tsn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val gaps = ev.groupBy { case (t, _, ts) => (t, ts / nd) }
      .toSeq.flatMap { case ((t, _), rs) =>
        val sorted = rs.map { case (_, id, ts) => (ts, id) }.sorted.toList
        sorted.sliding(2).collect {
          case Seq((a, _), (b, _)) => t -> ((b - a) / 1000L)
        }
      }
    val ref = gaps.groupBy(_._1).map { case (t, gs) =>
      val v = gs.map(_._2)
      (t, v.size.toLong, v.min, v.max, v.sum, v.sum / v.size)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == ref)
    got.foreach { case (_, n, mn, mx, sm, av) =>
      assert(n > 0 && mn >= 0 && av >= mn && av <= mx && sm >= mx)
    }
  }

  test("curateMultimodal (r14): the pair rule is EITHER-side — survivors " +
    "are exactly decode-ok ∩ quality-ok minus (image losers ∪ caption " +
    "losers), and the render accounts vision patches + caption tokens") {
    import org.apache.spark.sql.functions.col
    val docs = graft.relational.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.operators.CuratePipeline
      .curateMultimodal(spark, docs).collect()
    // recompose the survivor set from the component operators
    val ph = graft.operators.Multimodal.imagePhashOriented(docs)(spark)
      .localCheckpoint(true)
    val decodeOk = ph.where(col("hash_hi") >= 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val imgLosers = graft.operators.Dedup.imageNearDup(ph)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    val qualityOk = graft.operators.TextAnalysis.qualityScore(docs)
      .where(col("quality_ppm") >= 750000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val capLosers = graft.operators.Dedup.minhashLshAuto(docs)
      .where(col("est_jaccard_ppm") >= 750000L)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    val expected = (decodeOk & qualityOk) -- imgLosers -- capLosers
    assert(out.map(_.getLong(0)).toSet == expected)
    // the rule genuinely bites from BOTH sides on this corpus
    assert((expected & imgLosers).isEmpty && (expected & capLosers).isEmpty)
    assert(qualityOk.exists(imgLosers), "image side must drop someone")
    assert(decodeOk.exists(capLosers), "caption side must drop someone")
    assert(!decodeOk.contains(0L), "doc 0 is the truncated DLT arm (0 % 13)")
    out.foreach { r =>
      val (w, h) = (r.getLong(1), r.getLong(2))
      val patches = ((w + 3) / 4) * ((h + 3) / 4)
      assert(r.getLong(3) == patches && r.getLong(6) == patches)
      assert(r.getLong(5) == patches + r.getLong(4))
      assert(r.getString(7).startsWith(s"<|image:${w}x$h|> "))
    }
  }
}
