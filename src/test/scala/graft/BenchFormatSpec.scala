package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout contract: ONE JSON line that must survive the
  * driver's 2,000-byte output-tail window WHOLE. The window holds our
  * line PLUS sbt's trailing "[success] Total time: …" line (observed
  * 74 bytes incl. newline), so the head-safe budget is line + "\n" +
  * trailer ≤ 2,000. Round 3 lost a bench to full-precision doubles;
  * round 5 lost one to exactly this trailer (1,954-byte line +
  * 74-byte trailer > 2,000 → "parsed": null). */
class BenchFormatSpec extends AnyFunSuite {

  // sbt's post-run line; 74 bytes observed in the round-5 record.
  // Pad to 80 so the assertion survives trailer drift.
  private val sbtTrailer = "x" * 80

  private def survivesTailWindow(line: String): Unit =
    assert(line.length + 1 + sbtTrailer.length <= 2000,
      s"line (${line.length} B) + newline + ${sbtTrailer.length} B trailer " +
        "overflows the driver's 2,000-byte tail window")

  // adversarially long names (the real surface averages ~14 chars;
  // dd_contamination_bloomdist is 26)
  private def synthetic(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => f"xx_query_name_padded_$i%03d" -> (i * 0.137 + 10.0))

  private def parseable(line: String): Unit = {
    assert(!line.contains("\n"))
    // minimal JSON sanity without a parser dependency: balanced
    // braces, the declared fields present, and it ends cleanly
    assert(line.startsWith("{\"metric\":\"total\",\"value\":"))
    // three objects since r11: the envelope, "tiers", and "queries"
    assert(line.count(_ == '{') == 3 && line.count(_ == '}') == 3)
    assert(line.contains("\"tiers\":{\"prod\":"))
    assert(line.endsWith("\"}"))
  }

  test("current full surface fits the window; slow queries stay individually present") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // slowest-first ranking is what the ladder preserves; give each
    // query a distinct time so the kept set is deterministic
    val timed = names.zipWithIndex.map { case (n, i) => n -> (0.1 + i * 0.01) }
    val line = Bench.formatLine(timed, "/root/testdata/sf0.1")
    parseable(line)
    survivesTailWindow(line)
    // the ladder may fold the FASTEST queries into _rest (the full
    // per-query map is persisted to bench_full_<sf>.json by main),
    // but the slowest 50 must always be individually present — they
    // are what baseline comparison and regression adjudication read
    timed.sortBy(-_._2).take(50).foreach { case (n, _) =>
      assert(line.contains("\"" + n + "\":"), s"$n missing")
    }
  }

  test("100 long-named queries fit via the degradation ladder") {
    val line = Bench.formatLine(synthetic(100), "/root/testdata/sf0.1")
    parseable(line)
    survivesTailWindow(line)
  }

  test("300 long-named queries still fit; dropped tail lands in _rest") {
    val rs = synthetic(300)
    val line = Bench.formatLine(rs, "/root/testdata/sf0.1")
    parseable(line)
    survivesTailWindow(line)
    assert(line.contains("\"_rest\":"))
    // the exact total survives any truncation
    val total = rs.map(_._2).sum
    assert(line.contains(f"""\"value\":$total%.3f"""))
    // the slowest query is always individually present
    assert(line.contains("\"" + rs.maxBy(_._2)._1 + "\":"))
  }

  test("200 real-named queries: the ladder folds the FASTEST into " +
    "_rest and every one of the slowest 50 stays listed (r7)") {
    // the property the driver needs as the surface grows past 150:
    // _rest absorbs fast queries only, never the slow tail that
    // baseline comparison reads. Names are the real surface plus
    // realistic _v2 twins (not synthetic padding) so average name
    // length matches production.
    val real = SparkEntry.queries.keys.toSeq.sorted
    val names = (real ++ real.map(_ + "_v2")).take(200)
    assert(names.length == 200, s"need 200, surface gives ${real.size}")
    val timed = names.zipWithIndex.map { case (n, i) => n -> (0.1 + i * 0.013) }
    val line = Bench.formatLine(timed, "/root/testdata/sf0.1")
    parseable(line)
    survivesTailWindow(line)
    val slowest = timed.sortBy(-_._2).take(50)
    slowest.foreach { case (n, _) =>
      assert(line.contains("\"" + n + "\":"), s"slow query $n folded away")
    }
    assert(line.contains("\"_rest\":"), "200 queries must fold a tail")
    // _rest equals the sum of exactly the folded (fastest) queries:
    // total - listed = rest within print rounding
    val total = timed.map(_._2).sum
    assert(line.contains(f"""\"value\":$total%.3f"""))
  }

  test("tier split: prod + eval second sums cover the full surface " +
    "and survive the ladder's _rest folding (r11)") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val timed = names.zipWithIndex.map { case (n, i) => n -> (0.1 + i * 0.01) }
    val line = Bench.formatLine(timed, "/root/testdata/sf0.1")
    val tiers = "\"tiers\":\\{\"prod\":([0-9.]+),\"eval\":([0-9.]+)\\}".r
    val m = tiers.findFirstMatchIn(line).getOrElse(
      fail(s"tiers object missing from $line"))
    val (prod, ev) = (m.group(1).toDouble, m.group(2).toDouble)
    val total = timed.map(_._2).sum
    // 1-decimal rendering: each tier sum is exact to ±0.05
    assert(math.abs(prod + ev - total) < 0.11, s"$prod + $ev != $total")
    val evalTrue = timed.filter(t => SparkEntry.evalQueries.contains(t._1))
      .map(_._2).sum
    assert(math.abs(ev - evalTrue) < 0.06)
    // every declared eval query is a real query (set can't go stale)
    assert(SparkEntry.evalQueries.subsetOf(SparkEntry.queries.keySet))
  }

  test("regression gate: flags >1.5x AND >0.3s movers only, worst " +
    "first; parse round-trips the full record format (r8)") {
    val prevLine = Bench.formatLine(
      Seq("a" -> 1.0, "b" -> 0.1, "c" -> 2.0, "d" -> 0.05), "sf0.1")
    val prev = Bench.parseQueriesMap(prevLine)
    assert(prev == Map("a" -> 1.0, "b" -> 0.1, "c" -> 2.0, "d" -> 0.05))
    val cur = Seq(
      "a" -> 2.5,  // 2.5x and +1.5s → flagged
      "b" -> 0.3,  // 3x but only +0.2s → absolute threshold holds it
      "c" -> 2.9,  // +0.9s but 1.45x → ratio threshold holds it
      "d" -> 1.0,  // 20x and +0.95s → flagged
      "e" -> 9.9)  // new query, no previous → never flagged
    val regs = Bench.regressionDiff(prev, cur)
    assert(regs == Seq(("a", 1.0, 2.5), ("d", 0.05, 1.0)))
    assert(Bench.regressionDiff(Map.empty, cur).isEmpty)
    assert(Bench.parseQueriesMap("not json at all").isEmpty)
    // record truncated BEFORE the closing '}' of the queries map
    // (partial write / clipped tail) → empty, not StringIndexOOB
    assert(Bench.parseQueriesMap(
      """{"metric":"total","queries":{"a":1.0,"b":2""").isEmpty)
    assert(Bench.parseQueriesMap("""{"queries":{""").isEmpty)
  }

  test("line is locale-stable JSON with the declared fields") {
    val line = Bench.formatLine(Seq("q1" -> 1.5, "q2" -> 0.25), "sfX")
    assert(line == """{"metric":"total","value":1.750,"unit":"sec","tiers":{"prod":1.8,"eval":0.0},"queries":{"q1":1.50,"q2":0.25},"sf":"sfX"}""")
    assert(Bench.formatLine(Nil, "sfX").contains("\"value\":0.000"))
  }
}
