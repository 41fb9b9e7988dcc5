package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Graph operator checks (r6): the relationally-derived customer
  * graph's structural invariants, plus exact agreement of the
  * distributed BFS / PageRank loops with driver-side reference
  * implementations over the collected edge list. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val edges: Seq[(Long, Long)] = {
    val c = graft.relational.Tables.customer(spark, sf)
    Graph.customerEdges(c).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
  }
  private lazy val nodes: Set[Long] = {
    val c = graft.relational.Tables.customer(spark, sf)
    c.select("c_custkey").collect().map(_.getLong(0)).toSet
  }

  test("customerEdges: closed graph — every node has out-degree and " +
    "in-degree >= 1; |edges| = |customers| + |nations|") {
    val c = graft.relational.Tables.customer(spark, sf)
    val nNations = c.select("c_nationkey").distinct().count()
    assert(edges.size == nodes.size + nNations)
    assert(edges.map(_._1).toSet == nodes, "every node has an out-edge")
    assert(edges.map(_._2).toSet == nodes, "every node has an in-edge")
    // no self-loops unless a nation has a single customer
    val perNation = c.groupBy("c_nationkey").count().collect()
      .map(_.getLong(1))
    if (perNation.forall(_ > 1))
      assert(edges.count { case (s, d) => s == d } == 0)
  }

  test("reachability: matches a driver-side BFS over the collected " +
    "edges, capped at BfsDepth") {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val seeds = nodes.filter(_ % 100 == 1)
    assert(seeds.nonEmpty)
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    (1 to Graph.BfsDepth).foreach { step =>
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> step.toLong)
      frontier = next
    }
    val got = Graph.reachability(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist)
    // the cap binds: some node is beyond BfsDepth hops of every seed
    assert(got.size < nodes.size,
      "BfsDepth cap should leave part of the ring unreached")
    assert(got.values.max == Graph.BfsDepth.toLong)
  }

  test("pagerank: matches a driver-side integer-ppm reference over " +
    "the collected edges, every node present each round") {
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    var pr: Map[Long, Long] = nodes.map(_ -> 1000000L).toMap
    (1 to Graph.PrRounds).foreach { _ =>
      val contrib = edges.map { case (s, d) =>
        d -> Math.floorDiv(pr(s), outdeg(s).toLong)
      }
      pr = contrib.groupBy(_._1).map { case (d, cs) =>
        val s = cs.map(_._2).sum
        d -> (150000L + math.floor(s.toDouble * 850 / 1000).toLong)
      }
    }
    val got = Graph.pagerank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == pr)
    assert(got.keySet == nodes, "no rank mass lost: closed graph")
  }

  test("pagerankEdges: dangling-mass redistribution on a sink-bearing " +
    "fixture graph matches the reference recurrence; no mass vanishes (r7)") {
    import spark.implicits._
    // 1->2, 1->3, 2->3, 4->1: node 3 is a pure SINK (only ever a dst)
    // and node 4 has in-degree 0 — both classes the closed derived
    // graph never exercises.
    val fixture = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L))
    val df = fixture.toDF("src", "dst")
    // reference: pr' (v) = 150000 + floor(850*(sum contrib + D div N)/1000)
    val ns = (fixture.map(_._1) ++ fixture.map(_._2)).distinct
    val outdeg = fixture.groupBy(_._1).map { case (s, es) => s -> es.size }
    var pr: Map[Long, Long] = ns.map(_ -> 1000000L).toMap
    (1 to Graph.PrRounds).foreach { _ =>
      val dmass = ns.filterNot(outdeg.contains).map(pr).sum
      val share = dmass / ns.size
      val contrib = fixture.map { case (s, d) =>
        d -> Math.floorDiv(pr(s), outdeg(s).toLong)
      }.groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      pr = ns.map { v =>
        v -> (150000L + math.floor(
          (contrib.getOrElse(v, 0L) + share).toDouble * 850 / 1000).toLong)
      }.toMap
    }
    val got = Graph.pagerankEdges(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == pr)
    assert(got.keySet == ns.toSet,
      "sinks and in-degree-0 nodes keep rank rows")
    // the sink actually accumulated rank (it would hold the max here)
    assert(got(3L) == got.values.max)
    // and the closed-graph path is the D = 0 special case: the
    // customer-graph query through pagerankEdges must still match the
    // oracle recurrence without any dangling term (covered by the
    // pagerank test above running through the same core).
  }

  test("coOrderTriangles: degree-ordered count matches a driver-side " +
    "adjacency-set reference; every triangle counted exactly once") {
    val li = graft.relational.Tables.lineitem(spark, sf)
      .where(org.apache.spark.sql.functions.col("l_quantity") >= 25)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val coEdges: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { ls =>
      val ps = ls.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.size)
        yield (ps(i), ps(j))
    }.toSet
    assert(coEdges.nonEmpty)
    // reference: for each edge (a,b) with a<b, count common neighbors
    // c > b — enumerates each id-ordered triangle exactly once,
    // independent of the DEGREE ordering the operator uses
    val adj = (coEdges.toSeq ++ coEdges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val refPerVertex = collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    var refTotal = 0L
    coEdges.foreach { case (a, b) =>
      (adj(a) intersect adj(b)).filter(_ > b).foreach { c =>
        refTotal += 1
        Seq(a, b, c).foreach(v => refPerVertex(v) += 1)
      }
    }
    assert(refTotal > 0, "fixture corpus should contain triangles")
    val got = Graph.coOrderTriangles(
      graft.relational.Tables.lineitem(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPerVertex.toMap.filter(_._2 > 0))
    assert(got.values.sum == 3 * refTotal,
      "each triangle contributes to exactly its 3 vertices")
  }
}
