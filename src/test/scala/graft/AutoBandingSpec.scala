package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}
import graft.relational.Tables

/** r11: the sign-LSH banding rule mechanized (VERDICT r10 top_next).
  * Pins (a) the rule's recorded operating points — the sf0.1 anchor
  * width and the 10×-probe wide-twin width fall OUT of the formula,
  * so sim_knn_graph_auto is not a third behavior, it IS the anchor
  * at driver SFs and IS the wide twin at the probe's N — and (b)
  * that the auto operators equal their fixed-width twins at the
  * width the rule derives (the thread-through, not just the
  * arithmetic). */
class AutoBandingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("autoBits reproduces both recorded operating points and clamps") {
    // driver SFs: 500 (sf0.001/sf0.01) and 2000 (sf0.1) → the 4-bit anchor
    assert(Similarity.autoBits(500) == 4)
    assert(Similarity.autoBits(2000) == 4)
    // the 10× probe corpus (20k vectors) → the 8-bit wide twin
    assert(Similarity.autoBits(20000) == 8)
    // exact power-of-two boundary: 128·2^4 = 2048 is still 4 bits
    assert(Similarity.autoBits(2048) == 4)
    assert(Similarity.autoBits(2049) == 5)
    // clamps: tiny corpora floor at the anchor width, huge corpora
    // ceil at the 64-dim / 4-band dimension budget
    assert(Similarity.autoBits(0) == 4)
    assert(Similarity.autoBits(1) == 4)
    assert(Similarity.autoBits(Long.MaxValue) == 16)
    // 100× probe prediction (200k vectors): one step past the probe
    assert(Similarity.autoBits(200000) == 11)
  }

  test("autoSamplePct holds |sample| ~ target and reproduces the " +
    "pinned gate operating points") {
    // the r8/r9 pinned pcts fall out of the formula at the N=500 gate
    assert(Dedup.autoSamplePct(500, 150) == 30)
    assert(Dedup.autoSamplePct(500, 250) == 50)
    // growth dials the fraction down: |sample| stays ~constant
    assert(Dedup.autoSamplePct(5000, 150) == 3)
    assert(Dedup.autoSamplePct(50000, 150) == 1)
    assert(Dedup.autoSamplePct(2000, 250) == 13)
    assert(Dedup.autoSamplePct(20000, 250) == 2)
    // clamps: tiny corpora sample everything, huge ones floor at 1%
    assert(Dedup.autoSamplePct(100, 150) == 100)
    assert(Dedup.autoSamplePct(0, 150) == 100)
    assert(Dedup.autoSamplePct(Long.MaxValue, 150) == 1)
  }

  test("blocker recall reports at the auto pct equal the pinned-pct " +
    "anchor mode at the gate corpus size") {
    // N=500 ⇒ auto pct == the old pinned constants, so the declared
    // queries' gate hashes are byte-identical by construction
    val d = Tables.documents(spark, sf)
    val auto = Dedup.blockerRecallReport(d).collect().toSeq
    val pinned = Dedup.blockerRecallReport(d, samplePct = Some(30))
      .collect().toSeq
    assert(auto == pinned)
    val e = Tables.embeddings(spark, sf)
    val eAuto = Dedup.embedBlockerRecall(e).collect().toSeq
    val ePinned = Dedup.embedBlockerRecall(e, samplePct = Some(50))
      .collect().toSeq
    assert(eAuto == ePinned)
  }

  test("knnGraphAuto == knnGraph at the derived width (driver corpus)") {
    val e = Tables.embeddings(spark, sf)
    val bits = Similarity.autoBits(e.count())
    assert(bits == 4, "driver corpus must land on the anchor width")
    val auto = Similarity.knnGraphAuto(e).collect().toSeq
    val fixed = Similarity.knnGraph(e, bitsPerBand = bits).collect().toSeq
    assert(auto == fixed)
  }

  test("knnGraphUpsert derives the store width from the corpus (r13): " +
    "auto == the fixed-width merge at the derived width") {
    val e = Tables.embeddings(spark, sf)
    val auto = Similarity.knnGraphUpsert(e).collect().toSeq
    val fixed = Similarity.knnGraphUpsertWith(e, 4,
      x => Dedup.vectorBands(x, 4, 4), 10).collect().toSeq
    assert(auto == fixed && auto.nonEmpty)
  }

  test("embeddingNearDupAuto == embeddingNearDup at the derived width") {
    val e = Tables.embeddings(spark, sf)
    val auto = Dedup.embeddingNearDupAuto(e).collect().toSeq
    val fixed = Dedup.embeddingNearDup(e, bitsPerBand = 4).collect().toSeq
    assert(auto == fixed)
  }

  test("autoBandRows: integer-threshold LSH rule reproduces the 8×2 " +
    "operating point at driver SFs and steps at the 10^r boundaries") {
    // driver SFs (N ≤ 5×10³) → r = 2: the deployed 8×2 point
    assert(Dedup.autoBandRows(46) == 2)    // sf0.001 docs
    assert(Dedup.autoBandRows(500) == 2)   // sf0.01 docs
    assert(Dedup.autoBandRows(5000) == 2)  // sf0.1 docs
    // boundary is EXACTLY 10^r (1/s₂ = 10): 9999 stays, 10000 steps
    assert(Dedup.autoBandRows(9999L) == 2)
    assert(Dedup.autoBandRows(10000L) == 4)
    // both probe corpora (5×10⁴, 5×10⁵ docs) → the measured 4×4 arm
    assert(Dedup.autoBandRows(50000L) == 4)
    assert(Dedup.autoBandRows(500000L) == 4)
    assert(Dedup.autoBandRows(99999999L) == 4)
    assert(Dedup.autoBandRows(100000000L) == 8)
    assert(Dedup.autoBandRows(10000000000000000L) == 16)
    // clamps: tiny corpora floor at r=2 (never the 16×1 explosion
    // arm), the divide-down never overflows at Long.MaxValue
    assert(Dedup.autoBandRows(0) == 2)
    assert(Dedup.autoBandRows(Long.MaxValue) == 16)
  }

  test("minhashLshAuto == minhashLsh at the 8×2 point (driver corpus)") {
    val d = Tables.documents(spark, sf)
    val auto = Dedup.minhashLshAuto(d).collect().toSeq
    val fixed = Dedup.minhashLsh(d).collect().toSeq
    assert(auto == fixed && auto.nonEmpty)
  }

  test("a corpus past the 10^4 boundary derives the 4×4 banding and " +
    "the auto pairs equal the fixed 4×4 pairs") {
    // deterministic synthetic corpus: 10500 docs; each id ≡ 0 (mod
    // 200) doc PAIRS with its successor at Jaccard ≈ 1/3 (five shared
    // leading words, three distinct trailing ones) — the intermediate
    // similarity band where the 8×2 arm (s* = 0.354) and the 4×4 arm
    // (s* = 0.707) genuinely produce different candidate sets
    def w(p: String, c: org.apache.spark.sql.Column) = concat(lit(p), c)
    val id = col("id")
    val docs = spark.range(10500).select(id.as("doc_id"),
      when(id % 200 === 0, concat_ws(" ", w("f", id), w("g", id),
        w("h", id), w("i", id), w("j", id), lit("tail one common")))
        .when(id % 200 === 1, concat_ws(" ", w("f", id - 1), w("g", id - 1),
          w("h", id - 1), w("i", id - 1), w("j", id - 1),
          lit("per doc ending")))
        .otherwise(concat_ws(" ", w("a", id), w("b", id), w("c", id),
          w("d", id), w("e", id))).as("text"))
    assert(Dedup.autoBandRows(10500) == 4)
    val auto = Dedup.minhashLshAuto(docs).collect().toSeq
    val fixed = Dedup.minhashLsh(docs, bands = 4, rowsPerBand = 4)
      .collect().toSeq
    assert(auto == fixed && auto.nonEmpty)
    // and the banding genuinely changed vs the hand-fixed default
    val anchor = Dedup.minhashLsh(docs).collect().toSeq
    assert(auto != anchor)
  }

  test("a corpus past the 2048 boundary derives a NON-default width " +
    "and the auto graph equals the fixed graph at that width") {
    // deterministic synthetic corpus big enough to cross the rule's
    // first boundary: 3000 vectors → ⌈log₂(3000/128)⌉ = 5 bits
    val e = spark.range(3000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        (sin(col("id") * (d + lit(1)))).cast("float")).as("embedding"))
    assert(Similarity.autoBits(3000) == 5)
    val auto = Similarity.knnGraphAuto(e).collect().toSeq
    assert(auto.nonEmpty)
    val fixed = Similarity.knnGraph(e, bitsPerBand = 5).collect().toSeq
    assert(auto == fixed)
    // and the width genuinely changes the candidate set vs the anchor:
    // occupancy at 4 bits would be 187 per bucket — the rule exists
    // because that anchor plan is the quadratic one
    val anchor = Similarity.knnGraph(e, bitsPerBand = 4).collect().toSeq
    assert(auto != anchor)
  }
}
