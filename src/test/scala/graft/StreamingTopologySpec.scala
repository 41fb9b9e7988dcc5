package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingTopology

/** Streaming-shell integration: MemoryStream drives the same topology
  * through foreachBatch (the analog of the reference's EmbeddedKafka
  * layer — SURVEY.md §5). */
class StreamingTopologySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def beInt(n: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(n).array()

  test("all four sinks receive their branches from a single streamed read") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Array[Byte], Array[Byte])]
    val collected = scala.collection.mutable.Map[String, Seq[Row]]()
    def sink(name: String): DataFrame => Unit = { df =>
      collected.synchronized {
        collected(name) = collected.getOrElse(name, Seq.empty) ++ df.collect().toSeq
      }
    }
    val records = input.toDF().toDF("key", "value")
    val cp = java.nio.file.Files.createTempDirectory("graft-cp").toString
    val q = StreamingTopology.start(records,
      StreamingTopology.Sinks(
        output = sink("output"),
        processDlt = sink("processDlt"),
        deserializationDlt = sink("deserDlt"),
        productionDlt = sink("prodDlt")),
      checkpointDir = cp)
    try {
      input.addData(
        "key".getBytes("UTF-8") -> beInt(2),
        "key".getBytes("UTF-8") -> beInt(-1),
        "key".getBytes("UTF-8") -> "10".getBytes("UTF-8"),
        "key".getBytes("UTF-8") -> beInt(2000000))
      q.processAllAvailable()
    } finally q.stop()

    assert(collected("output").length == 1)
    assert(new String(collected("output").head.getAs[Array[Byte]]("value"), "UTF-8").length == 2)
    assert(collected("processDlt").length == 1)
    assert(collected("processDlt").head.getAs[Array[Byte]]("value").toSeq == beInt(-1).toSeq)
    assert(collected("deserDlt").length == 1)
    assert(collected("deserDlt").head.getAs[Array[Byte]]("value").toSeq == "10".getBytes("UTF-8").toSeq)
    assert(collected("prodDlt").length == 1)
    assert(collected("prodDlt").head.getAs[Array[Byte]]("value").isEmpty)
  }
}
