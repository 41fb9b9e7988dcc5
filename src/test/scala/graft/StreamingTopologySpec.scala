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
    // AvailableNow snapshots the source's end offset at query START —
    // data must be in the MemoryStream before start() or the one-shot
    // trigger sees an empty source (a race this test lost under load)
    input.addData(
      "key".getBytes("UTF-8") -> beInt(2),
      "key".getBytes("UTF-8") -> beInt(-1),
      "key".getBytes("UTF-8") -> "10".getBytes("UTF-8"),
      "key".getBytes("UTF-8") -> beInt(2000000))
    val q = StreamingTopology.start(records,
      StreamingTopology.Sinks(
        output = sink("output"),
        processDlt = sink("processDlt"),
        deserializationDlt = sink("deserDlt"),
        productionDlt = sink("prodDlt")),
      checkpointDir = cp)
    try q.processAllAvailable() finally q.stop()

    assert(collected("output").length == 1)
    assert(new String(collected("output").head.getAs[Array[Byte]]("value"), "UTF-8").length == 2)
    assert(collected("processDlt").length == 1)
    assert(collected("processDlt").head.getAs[Array[Byte]]("value").toSeq == beInt(-1).toSeq)
    assert(collected("deserDlt").length == 1)
    assert(collected("deserDlt").head.getAs[Array[Byte]]("value").toSeq == "10".getBytes("UTF-8").toSeq)
    assert(collected("prodDlt").length == 1)
    assert(collected("prodDlt").head.getAs[Array[Byte]]("value").isEmpty)
  }

  test("kill/resume from checkpoint: no re-emission, dedup state survives " +
    "the restart, data that arrived while down is processed exactly once (r11)") {
    // The reference's uncaught-exception contract is SHUTDOWN_APPLICATION
    // precisely so a clean restart resumes WITHOUT duplicates
    // (UncaughtExceptionHandlerConfig.java:19, README.md:31). Shutdown
    // .scala pins terminate-on-failure; this pins the other half —
    // resume-from-checkpoint with restored source offsets AND restored
    // dropDuplicatesWithinWatermark state.
    import java.sql.Timestamp
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamingCuration
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val corpus = Seq((0L, "preexisting corpus doc")).toDF("doc_id", "text")
    val mem = MemoryStream[(Timestamp, Long, String)]
    val collected =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val seenBatches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cp = java.nio.file.Files.createTempDirectory("graft-resume-cp").toString
    def start() = StreamingCuration
      .admitStream(StreamingCuration.dedupStream(
        mem.toDF().toDF("ts", "doc_id", "text")), corpus)
      .writeStream.option("checkpointLocation", cp)
      .outputMode(OutputMode.Append)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val rows = df.collect().map(r =>
          (batchId, r.getLong(1), r.getString(2)))
        collected.synchronized { collected ++= rows; seenBatches += batchId }
        ()
      }.start()

    // run 1: two committed micro-batches, then a clean stop
    val q1 = start()
    try {
      mem.addData((ts(0), 1L, "alpha beta"), (ts(1), 2L, "preexisting corpus doc"))
      q1.processAllAvailable()
      mem.addData((ts(2), 3L, "gamma delta"), (ts(3), 4L, "alpha beta"))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterRun1 = collected.map(t => (t._2, t._3)).toSet
    assert(afterRun1 == Set((1L, "alpha beta"), (3L, "gamma delta")),
      "corpus doc anti-joined away; in-stream dup dropped")

    // while DOWN: more data arrives, including a dup of a run-1 doc
    // (only restored dedup state can drop it) and a corpus dup
    mem.addData((ts(4), 5L, "alpha beta"),
      (ts(5), 6L, "epsilon zeta"),
      (ts(6), 7L, "preexisting corpus doc"))

    // run 2: same checkpoint — must NOT re-emit run-1 output, must
    // process the while-down arrivals exactly once
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    val all = collected.map(t => (t._2, t._3)).toSeq
    assert(all.size == all.distinct.size, s"re-emission after resume: $all")
    assert(all.toSet == Set((1L, "alpha beta"), (3L, "gamma delta"),
      (6L, "epsilon zeta")),
      "exactly the batch-oracle survivor set across the restart")
    // batch ids strictly increase across the restart — the resumed
    // query continues the committed log instead of replaying it
    assert(seenBatches.toSeq == seenBatches.toSeq.sorted &&
      seenBatches.toSeq.distinct == seenBatches.toSeq,
      s"batch ids must continue, not replay: $seenBatches")
  }
}
