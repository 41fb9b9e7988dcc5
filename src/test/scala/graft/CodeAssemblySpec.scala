package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Assembly, CodeCuration, Dedup}
import graft.relational.Tables

/** r10 family specs: code-corpus structural dedup and training-run
  * assembly. The DuckDB oracle proves value-level parity; these pin
  * the BEHAVIORAL claims the oracle cannot state — above all the
  * structural-dedup demonstration: raw bytes of the rendered code
  * never match across documents (doc-salted identifiers), so the
  * pairs dd_code_neardup emits are recoverable ONLY through the
  * identifier-normalization pass. */
class CodeAssemblySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)

  test("raw rendered bytes find ZERO cross-doc pairs; normalization recovers them") {
    val rawPairs = Dedup.codeNearDup(CodeCuration.codeGramTableRaw(docs)).count()
    val normPairs = Dedup.codeNearDup(CodeCuration.codeGramTable(docs)).count()
    assert(rawPairs == 0L,
      s"doc-salted identifiers must make raw grams disjoint, got $rawPairs pairs")
    assert(normPairs > 0L, "normalized near-dup must find the seeded near-dups")
  }

  test("normalizeCode: identifiers canonicalized, comments stripped, content words untouched") {
    val rendered = "def f_7():\n" +
      "  _v12 = lib.v1(seed)  # s0\n" +
      "  _v3 = lib.table(_v12)  # s1\n" +
      "  return _v3"
    val got = spark.range(1)
      .select(CodeCuration.normalizeCode(lit(rendered)).as("n"))
      .head().getString(0)
    // the content word `v1` (a probe-corpus variant marker) survives;
    // only the underscore-prefixed identifier namespace is rewritten
    assert(got ==
      "def f_7():\n  V = lib.v1(seed)\n  V = lib.table(V)\n  return V", got)
  }

  test("codeMeta: structural invariants hold for every file") {
    val words = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_words"))
    val bad = CodeCuration.codeMeta(docs).join(words, "doc_id")
      .where(col("n_lines") =!= col("n_words") + 2 ||
        col("n_ident_refs") =!= lit(2L) * col("n_words") ||
        col("n_comments") =!= col("n_words") ||
        col("n_distinct_idents") > col("n_ident_refs"))
      .count()
    assert(bad == 0L)
  }

  test("sftRender: loss span partitions the token budget; ctx flag consistent") {
    val r = Assembly.sftRender(Tables.orders(spark, sf), Tables.customer(spark, sf))
    val bad = r.where(
      col("loss_start") + col("completion_tokens") =!= col("total_tokens") ||
        col("prompt_tokens") =!= 10L ||
        col("ctx_ok") =!= (col("total_tokens") <= 18).cast("long")).count()
    assert(bad == 0L)
    // both ctx classes must occur (the flag is not vacuous)
    assert(r.select(countDistinct("ctx_ok")).head().getLong(0) == 2L)
  }

  test("mixPlan: shares bounded, requests within budget, oversample flag exact") {
    val p = Assembly.mixPlan(docs).cache()
    try {
      val ppmSum = p.agg(sum("target_ppm")).head().getLong(0)
      assert(ppmSum <= 1000000L && ppmSum > 900000L, s"ppm sum $ppmSum")
      val reqSum = p.agg(sum("requested_tokens")).head().getLong(0)
      assert(reqSum <= 10000000L)
      val bad = p.where(
        col("oversampled") =!= (col("requested_tokens") > col("tokens")).cast("long"))
        .count()
      assert(bad == 0L)
    } finally p.unpersist()
  }

  test("knnGraph: dense ranks per node, scores monotone in rank, no self-loops") {
    import graft.operators.Similarity
    val g = Similarity.knnGraph(Tables.embeddings(spark, sf)).cache()
    try {
      assert(g.where(col("vec_id") === col("neighbor_id")).count() == 0L)
      val badRank = g.groupBy("vec_id")
        .agg(max("rank").as("mx"), count(lit(1)).as("n"), min("rank").as("mn"))
        .where(col("mx") =!= col("n") || col("mn") =!= 1L || col("mx") > 4L)
        .count()
      assert(badRank == 0L, "ranks must be dense 1..<=k per node")
      val nxt = g.select(col("vec_id"), (col("rank") - 1L).as("rank"),
        col("cos_ppm").as("next_cos"))
      val badMono = g.join(nxt, Seq("vec_id", "rank"))
        .where(col("next_cos") > col("cos_ppm")).count()
      assert(badMono == 0L, "cos_ppm must be non-increasing in rank")
      // the near-dup pairs (cos >= 0.4 among band candidates) are by
      // definition candidate edges, so each must rank within its
      // endpoint's top-k OR be displaced only by >= -cos neighbors —
      // spot-check containment of the top-scoring near-dup pair
      val top = Dedup.embeddingNearDup(Tables.embeddings(spark, sf))
        .orderBy(col("cos_ppm").desc, col("vec_a")).head()
      val a = top.getLong(0); val b = top.getLong(1)
      assert(g.where(col("vec_id") === a && col("neighbor_id") === b).count() == 1L,
        s"highest-cos near-dup pair ($a,$b) missing from the graph")
    } finally g.unpersist()
  }

  test("mergeUpsert: one audit row per key, every MERGE arm populated, payloads exact") {
    import graft.relational.RelQueries
    val m = RelQueries.mergeUpsert(spark, sf).cache()
    try {
      val dupKeys = m.groupBy("key").count().where(col("count") > 1L).count()
      assert(dupKeys == 0L, "MERGE must emit exactly one audit row per key")
      val actions = m.select("action").distinct()
        .collect().map(_.getString(0)).toSet
      assert(actions == Set("keep", "insert", "update", "noop", "delete",
        "skip_absent"), s"arms populated: $actions")
      // update payload = base cents + 1000 (the derived batch bump)
      val o = Tables.orders(spark, sf).select(col("o_orderkey").as("key"),
        floor(col("o_totalprice") * 100).cast("long").as("pc"))
      val badUpd = m.where(col("action") === "update").join(o, "key")
        .where(col("price_c") =!= col("pc") + 1000L).count()
      assert(badUpd == 0L)
      // delete audit carries the OLD payload
      val badDel = m.where(col("action") === "delete").join(o, "key")
        .where(col("price_c") =!= col("pc")).count()
      assert(badDel == 0L)
    } finally m.unpersist()
  }

  test("yieldReport: policy lattice holds — cluster_keep_one removes a " +
    "superset of lsh_loser; every exact dup is also a cluster loser") {
    val r = Dedup.yieldReport(docs).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r.keySet == Set("exact", "lsh_loser", "cluster_keep_one"))
    // transitive closure can only ADD removals over the pairwise rule
    assert(r("cluster_keep_one")._1 >= r("lsh_loser")._1)
    assert(r("cluster_keep_one")._2 >= r("lsh_loser")._2)
    // identical texts share all shingles -> same cluster -> the exact
    // non-representative is a cluster non-keeper too (min-id policy
    // agrees), so exact's removal set is contained in cluster's
    assert(r("exact")._1 <= r("cluster_keep_one")._1)
  }

  test("dpoRender: one pair per 2+-order customer, chosen wins on URGENCY " +
    "(not total — margins go negative), fixed render arity") {
    val orders = Tables.orders(spark, sf)
    val r = Assembly.dpoRender(orders, Tables.customer(spark, sf)).cache()
    try {
      val eligible = orders.groupBy("o_custkey").count()
        .where(col("count") >= 2L).count()
      assert(r.count() == eligible, "exactly one pair per eligible customer")
      // the preference is priority order, so the chosen completion's
      // priority string is <= the rejected one's (lexicographic — the
      // '1-URGENT'..'5-LOW' encoding makes that the urgency order)
      val prio = (c: String) => regexp_extract(col(c), "priority ([^,]+),", 1)
      assert(r.where(prio("chosen") > prio("rejected")).count() == 0L)
      // urgency != value: both margin signs must occur, or the pair
      // label would be learnable from the reward column alone
      assert(r.where(col("margin_dollars") < 0L).count() > 0L)
      assert(r.where(col("margin_dollars") > 0L).count() > 0L)
      // template arity: both completions render to exactly 8 tokens
      val badTok = r.where(col("chosen_tokens") =!= 8L ||
        col("rejected_tokens") =!= 8L).count()
      assert(badTok == 0L)
      assert(r.where(col("chosen") === col("rejected")).count() == 0L)
    } finally r.unpersist()
  }

  test("epochOrder: epochs x docs rows, dense per-(epoch,shard) positions, " +
    "independent epoch shuffles, deterministic replay") {
    val o = Assembly.epochOrder(docs, epochs = 2, nShards = 8).cache()
    try {
      val n = docs.count()
      assert(o.count() == 2L * n)
      val badDense = o.groupBy("epoch", "shard_id")
        .agg(count(lit(1)).as("c"), max("shard_pos").as("mx"),
          min("shard_pos").as("mn"))
        .where(col("mx") =!= col("c") || col("mn") =!= 1L).count()
      assert(badDense == 0L, "shard positions must be dense 1..n")
      // epochs are INDEPENDENT shuffles: a doc's shard must not be
      // pinned across epochs (salt includes the epoch)
      val moved = o.groupBy("doc_id")
        .agg(countDistinct("shard_id").as("k")).where(col("k") > 1L).count()
      assert(moved > n / 2, s"only $moved/$n docs change shard across epochs")
      // replay contract: a second run is byte-identical
      val again = Assembly.epochOrder(docs, epochs = 2, nShards = 8)
      assert(o.exceptAll(again).count() == 0L && again.exceptAll(o).count() == 0L)
    } finally o.unpersist()
  }

  test("knnSq8: brute-force contract shape; asymmetric SQ8 ranking tracks " +
    "full-precision cosine closely") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf)
    val sq = Similarity.knnSq8(e).collect()
    val br = Similarity.knnBrute(e).collect()
    assert(sq.length == br.length, "same (query, k) surface as knnBrute")
    assert(sq.forall(x => x.getLong(0) != x.getLong(2)), "no self pairs")
    val sqTop = sq.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val brTop = br.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val overlap = brTop.map { case (q, t) => (sqTop(q) & t).size }.sum
    assert(overlap >= (br.length * 3) / 5,
      s"SQ8 top-5 overlap with exact top-5 too low: $overlap/${br.length}")
    // for neighbors BOTH rankings retain, the 8-bit dequantized score
    // sits within 5% of the exact cosine
    val brScore = br.map(x => (x.getLong(0), x.getLong(2)) -> x.getLong(3)).toMap
    val maxErr = sq.flatMap(x => brScore.get((x.getLong(0), x.getLong(2)))
      .map(v => math.abs(v - x.getLong(3)))).max
    assert(maxErr <= 50000L, s"SQ8 score error $maxErr ppm > 5%")
  }

  test("knnIvfSq8: identical candidate pruning to knnIvf; SQ8 cell codes " +
    "track full-precision in-cell scores closely") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf)
    val sq = Similarity.knnIvfSq8(e).collect()
    val iv = Similarity.knnIvf(e).collect()
    assert(sq.length == iv.length, "same (query, k) surface as knnIvf")
    assert(sq.forall(x => x.getLong(0) != x.getLong(2)), "no self pairs")
    // the IVF stage is unchanged, so the two operators rank the SAME
    // candidate pool — top-k lists must overlap heavily and shared
    // neighbors score within the SQ8 error envelope
    val ivTop = iv.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val sqTop = sq.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val overlap = ivTop.map { case (q, t) => (sqTop(q) & t).size }.sum
    assert(overlap >= (iv.length * 3) / 5,
      s"IVF-SQ8 top-5 overlap with IVF too low: $overlap/${iv.length}")
    val ivScore = iv.map(x => (x.getLong(0), x.getLong(2)) -> x.getLong(3)).toMap
    val maxErr = sq.flatMap(x => ivScore.get((x.getLong(0), x.getLong(2)))
      .map(v => math.abs(v - x.getLong(3)))).max
    assert(maxErr <= 50000L, s"IVF-SQ8 score error $maxErr ppm > 5%")
  }

  test("thresholdCurve: yields monotone non-increasing in threshold; " +
    "agrees with dd_lsh_verified at the 500k point") {
    val c = Dedup.thresholdCurve(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(c.length == 7)
    c.sliding(2).foreach { case Array((t1, p1, d1, k1), (t2, p2, d2, k2)) =>
      assert(p1 >= p2 && d1 >= d2 && k1 >= k2,
        s"curve must be non-increasing: $t1=($p1,$d1,$k1) vs $t2=($p2,$d2,$k2)")
    }
    // cross-operator law: the 500k point IS dd_lsh_verified's pair count
    val atDefault = c.find(_._1 == 500000L).get._2
    assert(atDefault == Dedup.lshVerified(docs).count(),
      "curve at 500k must equal the declared verified-pair operator")
    // losers are pair endpoints: distinct docs removed <= pairs
    c.foreach { case (_, p, d, _) => assert(d <= p || p == 0L) }
  }

  test("recallLadder: all six rungs present, counts consistent, exhaustive " +
    "rungs return a full top-k surface") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf)
    val rows = Similarity.recallLadder(e).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet == Set("bitsig", "ivf", "ivfpq", "ivfsq", "lsh", "sq8"))
    rows.foreach { case (m, (ret, hits, truth, ppm)) =>
      assert(hits <= ret && hits <= truth, s"$m: hits bound violated")
      assert(ppm >= 0L && ppm <= 1000000L, s"$m: recall ppm out of range")
      assert(ppm == 1000000L * hits / truth, s"$m: ppm inconsistent")
    }
    // exhaustive rungs (no candidate pruning) always fill the top-k
    val truth = rows("sq8")._3
    assert(rows("sq8")._1 == truth && rows("bitsig")._1 == truth,
      "exhaustive rungs must return exactly |truth| rows")
  }

  test("recallLadderPostDedup shares candidate generation (r13) yet " +
    "equals the two-independent-ladders definition row for row") {
    import graft.operators.{Dedup => D, Similarity}
    import org.apache.spark.sql.functions.lit
    val e = Tables.embeddings(spark, sf)
    val shared = Similarity.recallLadderPostDedup(e).collect().toSeq
    // the semantic definition: one full ladder per corpus — the shape
    // the operator ran as before the content-only rungs were shared
    val losers = D.embeddingNearDup(e)
      .select(col("vec_b").as("vec_id")).distinct()
    val surv = e.join(losers, Seq("vec_id"), "left_anti")
    val twoLadders = Similarity.recallLadder(e)
      .select(lit("raw").as("corpus"), col("*"))
      .unionByName(Similarity.recallLadder(surv)
        .select(lit("dedup").as("corpus"), col("*")))
      .orderBy("corpus", "method").collect().toSeq
    assert(shared == twoLadders && shared.size == 12)
  }

  test("attribMulti: credit sums to exactly 1e6 ppm per purchase, positions " +
    "dense, last touch agrees with the as-of pick") {
    import graft.relational.RelQueries
    // unbounded lookback at sf0.001: every prior click attributes, so
    // the first/middle/last arms are all exercised (the 1h production
    // window only yields multi-touch at the probe's duplicated rows)
    val a = RelQueries.attribMulti(spark, sf, windowUs = Long.MaxValue / 4).cache()
    try {
      val badSum = a.groupBy("purchase_id")
        .agg(sum("weight_ppm").as("s"), max("pos").as("mx"),
          count(lit(1)).as("n"), min("pos").as("mn"))
        .where(col("s") =!= 1000000L || col("mx") =!= col("n") ||
          col("mn") =!= 1L).count()
      assert(badSum == 0L, "every purchase's credit must sum to exactly 1e6")
      // multi-touch must actually occur (the U-shape is not vacuous)
      assert(a.where(col("n_touch") >= 3L).count() > 0L)
      // the pos == n_touch click IS purchaseLastClick's pick (same
      // total order; the window is unbounded here, matching as-of)
      val last = a.where(col("pos") === col("n_touch"))
        .select(col("purchase_id"), col("click_id"))
      val asof = RelQueries.purchaseLastClick(spark, sf)
        .select(col("purchase_id"), col("click_id").as("asof_click"))
      val disagree = last.join(asof, "purchase_id")
        .where(col("click_id") =!= col("asof_click")).count()
      assert(disagree == 0L, "U-shape last touch must equal the as-of pick")
    } finally a.unpersist()
  }

  test("tCloseness: one row per QI class, members partition the table, " +
    "EMD bounded and zero iff distribution matches global") {
    import graft.relational.RelQueries
    val t = RelQueries.tCloseness(spark, sf).cache()
    try {
      val cust = Tables.customer(spark, sf)
      assert(t.count() ==
        cust.select("c_nationkey", "c_mktsegment").distinct().count())
      assert(t.agg(sum("n_members")).head().getLong(0) == cust.count())
      val bad = t.where(col("emd_ppm") < 0L || col("emd_ppm") > 1000000L ||
        col("at_risk") =!= (col("emd_ppm") > 200000L).cast("long")).count()
      assert(bad == 0L)
      // the gate is not vacuous on this corpus: both classes at risk
      // and classes in the clear must occur
      assert(t.select(countDistinct("at_risk")).head().getLong(0) == 2L)
    } finally t.unpersist()
  }

  test("mutualKnn: every mutual edge exists in the kNN graph in BOTH " +
    "directions with its exact ranks") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf)
    val g = Similarity.knnGraph(e).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val m = Similarity.mutualKnn(e).collect()
    assert(m.nonEmpty, "seeded near-dups must produce mutual edges")
    m.foreach { r =>
      val a = r.getLong(0); val b = r.getLong(1)
      assert(a < b, "mutual edges are canonical (a < b)")
      assert(g.get((a, b)).contains(r.getLong(3)), s"($a,$b) fwd rank")
      assert(g.get((b, a)).contains(r.getLong(4)), s"($a,$b) rev rank")
    }
    // completeness: every reciprocal graph pair appears exactly once
    val recip = g.keys.filter { case (x, y) => x < y && g.contains((y, x)) }
    assert(m.length == recip.size)
  }

  test("containmentBlocked: a strict subset of the exact containment anchor " +
    "with identical scores; recall measured") {
    val exact = Dedup.containment(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val blocked = Dedup.containmentBlocked(docs).collect()
    blocked.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exact.get(key).contains(r.getLong(3)),
        s"$key: blocked pair missing from anchor or score drifted")
    }
    val recall = blocked.length.toDouble / exact.size
    info(f"bottom-4 sketch recall vs exact containment: $recall%.3f " +
      s"(${blocked.length}/${exact.size})")
    assert(recall >= 0.5, f"bottom-k recall collapsed: $recall%.3f")
  }

  test("containmentBlocked blocking-key df cap (r15): pair-set INVARIANT " +
    "at the gate SF (no bottom-k key is that hot here), and a planted " +
    "boilerplate key is dropped whole without losing rare-run pairs") {
    import spark.implicits._
    // invariance on the real corpus: capped ≡ effectively-uncapped
    def pairs(maxKeyDf: Int) = Dedup
      .containmentBlocked(docs, maxKeyDf = maxKeyDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(pairs(50) == pairs(1000000),
      "the df-50 cap changed the gate-SF pair set — a key is hotter " +
        "than the invariance assumption")
    // planted hot key: 60 docs of 3 shingles each — the 2 shared ones
    // are in EVERY doc's bottom-4 (df = 60 > maxKeyDf), the third is
    // unique — plus one genuine containment pair sharing a RARE run.
    // Uncapped, the boiler docs all pair (2/3 shared = 666,666 ppm);
    // capped, their only blocking keys are the unique shingles, so
    // the quadratic hot key produces ZERO candidates while the rare
    // pair survives.
    val boiler = (0 until 60).map { i =>
      (1000L + i, s"common legal boilerplate header unique$i")
    }
    val rare = Seq(
      (2000L, "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8"),
      (2001L, "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 extra trailing words here"))
    val planted = (boiler ++ rare).toDF("doc_id", "text")
    val uncapped = Dedup.containmentBlocked(planted, maxKeyDf = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.exists { case (a, b) => a >= 1000L && b < 2000L },
      "sanity: the planted hot key must pair uncapped")
    val out = Dedup.containmentBlocked(planted, maxKeyDf = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((2000L, 2001L)), "rare-run pair lost to the cap")
    assert(!out.exists { case (a, b) => a >= 1000L && b < 2000L },
      "boilerplate hot-key candidates survived the cap")
  }

  test("minhashCalibration: both families reported, estimator error inside " +
    "the K=16 concentration envelope") {
    val rows = Dedup.minhashCalibration(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set("minhash16", "oph16"))
    rows.foreach { case (m, (n, mean, mx)) =>
      assert(n > 0L, s"$m: no candidate pairs scored")
      assert(mean <= mx && mx <= 1000000L, s"$m: stat ordering")
      // K=16 minima: sd <= 1/(2*sqrt(16)) = 12.5% at worst-case j;
      // candidates skew to high j where variance shrinks further
      assert(mean <= 125000L, s"$m: mean error $mean ppm outside envelope")
    }
  }

  test("ivfBalance: occupancies partition the corpus; balance averages the " +
    "uniform share") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf)
    val b = Similarity.ivfBalance(e).collect()
    assert(b.length == 8, "every centroid owns a cell at this corpus")
    val n = b.map(_.getLong(1)).sum
    assert(n > 0L && b.forall(_.getLong(1) > 0L))
    val meanBal = b.map(_.getLong(2)).sum / b.length
    assert(meanBal > 900000L && meanBal < 1100000L,
      s"mean balance $meanBal must straddle the uniform share")
  }

  test("indexPipeline: survivors partition the deduped corpus; every cell " +
    "shrinks or holds vs the undeduped index (same codebook)") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf)
    val m = Similarity.indexPipeline(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullCells = Similarity.ivfBalance(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same deterministic codebook => dedup can only REMOVE from a cell
    m.foreach { case (cid, n) =>
      assert(n <= fullCells(cid), s"cell $cid grew after dedup")
    }
    val losers = Dedup.embeddingNearDup(e)
      .select("vec_b").distinct().count()
    assert(m.values.sum == fullCells.values.sum - losers,
      "survivor occupancies must partition corpus minus distinct losers")
    assert(losers > 0L, "seeded near-dups must remove something")
  }

  test("knnDescent: per-node best cosine never decreases vs the raw graph " +
    "(candidate superset law); brute-truth recall does not regress") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf)
    def best(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.where(col("rank") === 1L).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val g = Similarity.knnGraph(e)
    val d = Similarity.knnDescent(e)
    val gBest = best(g); val dBest = best(d)
    gBest.foreach { case (v, c) =>
      assert(dBest.getOrElse(v, Long.MinValue) >= c,
        s"node $v: descent best ${dBest.get(v)} < graph best $c")
    }
    // recall@4 vs exact truth for the 8 standard query ids
    val truth = Similarity.knnBrute(e, nQueries = 8, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def hits(df: org.apache.spark.sql.DataFrame): Int =
      df.where(col("vec_id") < 8).collect()
        .map(r => (r.getLong(0), r.getLong(2))).count(truth)
    val hg = hits(g); val hd = hits(d)
    info(s"graph recall@4 hits $hg/${truth.size}; after one descent round $hd")
    assert(hd >= hg, "one descent round must not lose true neighbors")
  }

  test("curriculumOrder: identical shard assignment to epochOrder; each " +
    "shard streams easy-to-hard (quality non-increasing in position)") {
    val c = Assembly.curriculumOrder(docs).cache()
    try {
      val e = Assembly.epochOrder(docs)
        .select(col("epoch"), col("doc_id"), col("shard_id").as("e_shard"))
      val moved = c.join(e, Seq("epoch", "doc_id"))
        .where(col("shard_id") =!= col("e_shard")).count()
      assert(moved == 0L, "curriculum must reorder WITHIN shards, not move docs")
      val nxt = c.select(col("epoch"), col("shard_id"),
        (col("shard_pos") - 1L).as("shard_pos"),
        col("quality_ppm").as("next_q"))
      val badMono = c.join(nxt, Seq("epoch", "shard_id", "shard_pos"))
        .where(col("next_q") > col("quality_ppm")).count()
      assert(badMono == 0L, "quality must be non-increasing within a shard")
      // the order is genuinely curriculum, not salt: quality varies
      assert(c.select(countDistinct("quality_ppm")).head().getLong(0) > 1L)
    } finally c.unpersist()
  }

  test("trendSlope: sufficient statistics match a driver-side exact OLS " +
    "rebuild; ppm form is floor of the exact ratio") {
    import graft.relational.{RelQueries, Tables}
    val rows = RelQueries.trendSlope(spark, sf).collect()
    assert(rows.nonEmpty)
    // exact rebuild from raw events for every type
    val daily = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(ts AS BIGINT) div 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val day0 = daily.map(_._2).min
    rows.foreach { r =>
      val t = r.getString(0)
      val pts = daily.filter(_._1 == t).map { case (_, d, n) => (d - day0, n) }
      val m = pts.length.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      assert(r.getLong(1) == m && r.getLong(2) == m * sxy - sx * sy &&
        r.getLong(3) == m * sxx - sx * sx, s"$t: sufficient stats drifted")
      val den = m * sxx - sx * sx
      if (den > 0) {
        val expect = math.floor(1e6 * (m * sxy - sx * sy) / den).toLong
        assert(r.getLong(4) == expect, s"$t: ppm form")
      }
    }
  }

  test("shardPlan: every doc lands in exactly one of 16 shards; balance reported") {
    val s = Assembly.shardPlan(docs).cache()
    try {
      assert(s.count() == 16L)
      assert(s.agg(sum("n_docs")).head().getLong(0) == docs.count())
      assert(s.select(min("shard_id")).head().getLong(0) >= 0L &&
        s.select(max("shard_id")).head().getLong(0) <= 15L)
      // balance_ppm averages ~1e6 by construction
      val mean = s.agg(avg("balance_ppm")).head().getDouble(0)
      assert(mean > 900000 && mean < 1100000, s"mean balance $mean")
    } finally s.unpersist()
  }
}
