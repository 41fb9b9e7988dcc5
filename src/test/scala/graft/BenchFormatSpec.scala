package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout contract: ONE JSON line that must survive the
  * driver's 2 kB output-tail window (minus sbt's trailing
  * "[success]" line) at ANY surface size — round 3 lost a bench run
  * to head-truncation of an overlong line. */
class BenchFormatSpec extends AnyFunSuite {

  // adversarially long names (the real surface averages ~14 chars;
  // dd_contamination_bloomdist is 26)
  private def synthetic(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => f"xx_query_name_padded_$i%03d" -> (i * 0.137 + 10.0))

  private def parseable(line: String): Unit = {
    assert(!line.contains("\n"))
    // minimal JSON sanity without a parser dependency: balanced
    // braces, the declared fields present, and it ends cleanly
    assert(line.startsWith("{\"metric\":\"total\",\"value\":"))
    assert(line.count(_ == '{') == 2 && line.count(_ == '}') == 2)
    assert(line.endsWith("\"}"))
  }

  test("current full surface fits with every query individually present") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val line = Bench.formatLine(names.map(_ -> 1.23), "/root/testdata/sf0.1")
    parseable(line)
    // the ladder accepts lines up to its 1960-byte budget inclusive
    // (2048-byte tail minus sbt's ~62-byte trailing line)
    assert(line.length <= 1960, s"line is ${line.length} bytes")
    // the ladder may drop precision as the surface grows, but at the
    // current size no query may be folded away into _rest
    assert(!line.contains("\"_rest\":"))
    names.foreach(n => assert(line.contains("\"" + n + "\":"), s"$n missing"))
  }

  test("100 long-named queries fit via the degradation ladder") {
    val line = Bench.formatLine(synthetic(100), "/root/testdata/sf0.1")
    parseable(line)
    assert(line.length <= 1960, s"line is ${line.length} bytes")
  }

  test("300 long-named queries still fit; dropped tail lands in _rest") {
    val rs = synthetic(300)
    val line = Bench.formatLine(rs, "/root/testdata/sf0.1")
    parseable(line)
    assert(line.length <= 1960, s"line is ${line.length} bytes")
    assert(line.contains("\"_rest\":"))
    // the exact total survives any truncation
    val total = rs.map(_._2).sum
    assert(line.contains(f"""\"value\":$total%.3f"""))
    // the slowest query is always individually present
    assert(line.contains("\"" + rs.maxBy(_._2)._1 + "\":"))
  }

  test("line is locale-stable JSON with the declared fields") {
    val line = Bench.formatLine(Seq("q1" -> 1.5, "q2" -> 0.25), "sfX")
    assert(line == """{"metric":"total","value":1.750,"unit":"sec","queries":{"q1":1.50,"q2":0.25},"sf":"sfX"}""")
    assert(Bench.formatLine(Nil, "sfX").contains("\"value\":0.000"))
  }
}
