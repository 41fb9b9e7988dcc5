package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ErrorChannel, ErrorHandlingTopology}

/** The reference's observable behavioral contract (SURVEY.md §2.3,
  * FIXTURES.md §1) replayed through the batch topology — the analog of
  * the reference's TopologyTestDriver unit layer
  * (reference: src/test/java/.../ErrorHandlingTopologyTest.java). */
class ErrorChannelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def beInt(n: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(n).array()

  private def records(rows: (String, Array[Byte])*): DataFrame =
    rows.map { case (k, v) => (k.getBytes("UTF-8"), v) }.toDF("key", "value")

  private def run(rows: (String, Array[Byte])*): ErrorHandlingTopology.Branches =
    ErrorHandlingTopology(records(rows: _*))

  private def headerMap(r: Row): Map[String, String] =
    r.getAs[Seq[Row]]("headers")
      .map(h => h.getAs[String]("key") -> new String(h.getAs[Array[Byte]]("value"), "UTF-8"))
      .toMap

  test("happy path ('key', 2): one output record, 2-char [a-z] value, key unchanged") {
    // reference: ErrorHandlingTopologyTest.java:42-48
    val b = run("key" -> beInt(2))
    val out = b.output.collect()
    assert(out.length == 1)
    assert(new String(out(0).getAs[Array[Byte]]("key"), "UTF-8") == "key")
    val value = new String(out(0).getAs[Array[Byte]]("value"), "UTF-8")
    assert(value.length == 2)
    assert(value.forall(c => c >= 'a' && c <= 'z'))
    assert(b.processDlt.isEmpty && b.deserializationDlt.isEmpty && b.productionDlt.isEmpty)
  }

  test("process error ('key', -1): no output; DLT has ORIGINAL value and rendered header") {
    // reference: ErrorHandlingTopologyTest.java:50-59
    val b = run("key" -> beInt(-1))
    assert(b.output.isEmpty, "a failing record produces nothing on output")
    val dlt = b.processDlt.collect()
    assert(dlt.length == 1)
    assert(new String(dlt(0).getAs[Array[Byte]]("key"), "UTF-8") == "key")
    // DLT carries the original Integer, re-encoded big-endian (§2.3-1)
    assert(dlt(0).getAs[Array[Byte]]("value").toSeq == beInt(-1).toSeq)
    assert(headerMap(dlt(0))(ErrorChannel.ErrorHeaderKey)
      == "java.lang.IllegalArgumentException: -1") // §2.3-2
  }

  test("deserialization error ('key', \"10\"): raw bytes preserved + deserializer message") {
    // reference: ErrorHandlingTopologyIntegrationTest.java:86-104
    val raw = "10".getBytes("UTF-8")
    val b = run("key" -> raw)
    assert(b.output.isEmpty && b.processDlt.isEmpty)
    val dlt = b.deserializationDlt.collect()
    assert(dlt.length == 1)
    assert(dlt(0).getAs[Array[Byte]]("value").toSeq == raw.toSeq, "§2.3-5 pass-through")
    assert(headerMap(dlt(0))(ErrorChannel.ErrorHeaderKey)
      == "Size of data received by IntegerDeserializer is not 4")
  }

  test("production error ('key', 2,000,000): DLT value EMPTY, size message, 2,000,091 bytes") {
    // reference: ErrorHandlingTopologyIntegrationTest.java:106-122
    val b = run("key" -> beInt(2000000))
    assert(b.output.isEmpty, "oversized record never reaches output")
    val dlt = b.productionDlt.collect()
    assert(dlt.length == 1)
    assert(dlt(0).getAs[Array[Byte]]("value").length == 0, "§2.3-6 truncation")
    val msg = headerMap(dlt(0))(ErrorChannel.ErrorHeaderKey)
    assert(msg.contains("2000091 bytes"), s"size matches the reference measurement: $msg")
    assert(msg.contains("larger than 1048576"))
  }

  test("routing totality: every record lands in exactly one branch") {
    // FIXTURES.md §2 — n in [-50, 50] plus undecodable payloads
    val rows = (-50 to 50).map(n => s"k$n" -> beInt(n)) ++
      Seq("bad1" -> "xx".getBytes("UTF-8"), "bad2" -> Array[Byte](1, 2, 3, 4, 5))
    val b = run(rows: _*)
    val total = b.output.count() + b.processDlt.count() +
      b.deserializationDlt.count() + b.productionDlt.count()
    assert(total == rows.length)
    assert(b.output.count() == 51)             // n in [0, 50]
    assert(b.processDlt.count() == 50)         // n in [-50, -1]
    assert(b.deserializationDlt.count() == 2)
  }

  test("output value length equals the decoded input integer (contract §2.3-4)") {
    val b = run((0 to 20).map(n => s"k$n" -> beInt(n)): _*)
    val lens = b.output.collect()
      .map(r => new String(r.getAs[Array[Byte]]("key"), "UTF-8").drop(1).toInt ->
                r.getAs[Array[Byte]]("value").length).toMap
    (0 to 20).foreach(n => assert(lens(n) == n))
  }

  test("key is never altered on any path (contract §2.3-7)") {
    val rows = Seq("a" -> beInt(3), "b" -> beInt(-2), "c" -> "zz".getBytes("UTF-8"))
    val b = run(rows: _*)
    val keys = (b.output.collect() ++ b.processDlt.collect() ++
      b.deserializationDlt.collect())
      .map(r => new String(r.getAs[Array[Byte]]("key"), "UTF-8")).sorted.toSeq
    assert(keys == Seq("a", "b", "c"))
  }

  test("branchTag (one-pass) counts match the four-branch topology exactly") {
    // the flagship entry's single-scan accounting path must agree with
    // the materialized branches on every route, incl. the size guard
    val rows = (-50 to 50).map(n => s"k$n" -> beInt(n)) ++
      Seq("bad1" -> "xx".getBytes("UTF-8"),
          "big" -> beInt(2000000)) // routes to output shape, then trips the guard
    val df = records(rows: _*)
    val b = ErrorHandlingTopology(df)
    val tagged = ErrorHandlingTopology.branchTag(df)
      .groupBy("branch").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tagged.values.sum == rows.length, "split totality under tagging")
    assert(tagged("output") == b.output.count())
    assert(tagged("process-exception.DLT") == b.processDlt.count())
    assert(tagged("deserialization-exception.DLT") == b.deserializationDlt.count())
    assert(tagged("production-exception.DLT") == b.productionDlt.count())
  }

  test("existing headers are preserved when the error header is appended") {
    import org.apache.spark.sql.functions._
    val base = records("key" -> beInt(-1))
      .withColumn("headers",
        array(struct(lit("trace").as("key"), lit("t1".getBytes("UTF-8")).as("value"))))
    val dlt = ErrorHandlingTopology(base).processDlt.collect()
    val hs = headerMap(dlt(0))
    assert(hs("trace") == "t1" && hs(ErrorChannel.ErrorHeaderKey).nonEmpty)
  }
}
