package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** r9-continuation retrieval/verify family: BM25 ranking, MIPS
  * top-k, edit-distance-verified near-dup, audio near-dup. Each
  * operator is cross-checked against an INDEPENDENT local
  * recomputation (plain Scala over collected rows) at sf0.001 —
  * the same role the DuckDB oracle plays at the gate, but inside
  * `sbt test`. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("tx_bm25: every reported score matches a hand-rolled integer BM25") {
    val out = SparkEntry.queries("tx_bm25")(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val n = docs.size.toLong
    val l = docs.values.map(_.size.toLong).sum
    val dfMap = docs.values.flatMap(_.distinct)
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    def score(terms: Seq[String], id: Long): Long = {
      val ws = docs(id)
      val dl = ws.size.toLong
      terms.map { t =>
        val tf = ws.count(_ == t).toLong
        if (tf == 0L) 0L
        else {
          val df = dfMap(t)
          val w = (1000000L * (2 * n - 2 * df + 1)) / (2 * df + 1)
          val r = (900000L * dl * n) / l
          val sat = (2200000L * tf * 1000000L) / (1000000L * tf + 300000L + r)
          (w * sat) / 1000000000L
        }
      }.sum
    }
    val qmap = TextAnalysis.Bm25Queries.toMap
    out.foreach { row =>
      val q = row.getAs[Long]("query_id")
      val d = row.getAs[Long]("doc_id")
      assert(row.getAs[Long]("score_milli") == score(qmap(q), d),
        s"score mismatch q$q doc$d")
    }
    // ranks are contiguous 1..k per query and ordered by (score, id)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to rows.length).toSeq, s"ranks not contiguous for q$q")
      val scores = sorted.map(r =>
        (-r.getAs[Long]("score_milli"), r.getAs[Long]("doc_id"))).toSeq
      assert(scores == scores.sorted, s"rank order wrong for q$q")
    }
  }

  test("sim_mips: top list equals the local exact argmax-dot ranking") {
    val out = SparkEntry.queries("sim_mips")(spark, sf).collect()
    assert(out.nonEmpty)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1024).toLong))
      .toMap
    def norm2(v: Seq[Long]) = v.map(x => x * x).sum
    val base = vecs.filter { case (_, v) => norm2(v) > 0 }
    def dot(a: Seq[Long], b: Seq[Long]) = a.zip(b).map(t => t._1 * t._2).sum
    (0L until 8L).foreach { q =>
      base.get(q).foreach { qv =>
        val expect = base.toSeq.filter(_._1 != q)
          .map { case (id, v) => (id, dot(qv, v)) }
          .sortBy { case (id, d) => (-d, id) }.take(5)
        val got = out.filter(_.getAs[Long]("query_id") == q)
          .sortBy(_.getAs[Long]("rank"))
          .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Long]("dot_q")))
          .toSeq
        assert(got == expect, s"query $q MIPS top-5 mismatch")
      }
    }
  }

  test("sim_mips_ivf: scores are exact dots; results are a subset of probed cells") {
    val brute = SparkEntry.queries("sim_mips")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Long]("dot_q")).toMap
    val ivf = SparkEntry.queries("sim_mips_ivf")(spark, sf).collect()
    assert(ivf.nonEmpty)
    // any (query, neighbor) IVF returns that brute also ranked must
    // carry the identical exact dot — same scoring, fewer candidates
    ivf.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      brute.get(key).foreach { d =>
        assert(d == r.getAs[Long]("dot_q"), s"dot mismatch at $key")
      }
    }
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val ds = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("dot_q")).toSeq
      assert(ds == ds.sorted.reverse, s"q$q not ranked by dot desc")
    }
  }

  test("dd_edit_verified: finds a 2-edit pair; df-cap kills a boilerplate prefix") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then naps by the warm stove all afternoon long"
    val near = base.updated(4, 'z').updated(50, 'x')
    // 20 docs sharing ONLY a 16-char boilerplate prefix (gram df 20 >
    // maxDf 16 -> dropped whole); suffixes are per-doc letter runs, so
    // every other gram is unique and pairwise distance is ~60
    val hot = (100 until 120).map { i =>
      (i.toLong, "BOILERPLATE-HDR:" + ('a' + (i - 100)).toChar.toString * 60)
    }
    val docs = (Seq((1L, base), (2L, near)) ++ hot).toDF("doc_id", "text")
    val out = Dedup.editVerified(docs).collect()
    val pair = out.find(r =>
      r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(pair.isDefined, "2-edit pair not found")
    assert(pair.get.getAs[Long]("dist") == 2L)
    assert(!out.exists(r => r.getAs[Long]("doc_a") >= 100L),
      "df-capped boilerplate family must produce no candidate pairs")
  }

  test("dd_audio_neardup: pairs are in-group only, above threshold, non-empty") {
    val out = SparkEntry.queries("dd_audio_neardup")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val a = r.getAs[Long]("doc_a")
      val b = r.getAs[Long]("doc_b")
      assert(a / 4 == b / 4, s"cross-group audio pair ($a,$b)")
      assert(r.getAs[Long]("jaccard_ppm") >= 400000L)
      assert(a % 13 != 0 && b % 13 != 0, "corrupt doc in a pair")
    }
  }

  test("sim_hard_negatives (r13): every mined negative sits inside the " +
    "hard band, ranks are dense, and NO negative is a near-dup of its " +
    "anchor — the band's upper edge IS the dedup threshold") {
    import org.apache.spark.sql.functions.col
    val e = graft.relational.Tables.embeddings(spark, sf)
    val out = graft.operators.Similarity.hardNegatives(e).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq ==
        (1L to rows.length).toSeq, "ranks must be dense per anchor")
    }
    out.foreach { r =>
      val cos = r.getLong(3)
      assert(cos >= 250000L && cos < 400000L, s"outside the band: $cos")
    }
    // a contrastive negative that is actually a duplicate poisons the
    // loss: the near-dup pair set (verify threshold 400000, the same
    // constant) must not contain any (anchor, negative) pair
    val dup = graft.operators.Dedup.embeddingNearDup(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { r =>
      val (a, n) = (r.getLong(0), r.getLong(2))
      assert(!dup.contains((math.min(a, n), math.max(a, n))),
        s"near-dup leaked into the negatives: ($a, $n)")
    }
  }
}
