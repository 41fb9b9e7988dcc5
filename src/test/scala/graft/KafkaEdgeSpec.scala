package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.KafkaEdge

/** Broker-free contract tests for the Kafka edge shaping: sink
  * column set/types (the connector rejects anything else) and the
  * header schema the DLT branches rely on. */
class KafkaEdgeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("toSinkShape emits exactly topic/key/value(/headers) with binary k/v") {
    val df = Seq(("k1", "v1")).toDF("key", "value")
    val shaped = KafkaEdge.toSinkShape(df, "output")
    assert(shaped.columns.toSeq == Seq("topic", "key", "value"))
    assert(shaped.schema("key").dataType == BinaryType)
    assert(shaped.schema("value").dataType == BinaryType)
    assert(shaped.head.getString(0) == "output")
  }

  test("headers column passes through with the connector's exact type") {
    val withHeaders = Seq(("k", "v")).toDF("key", "value")
      .withColumn("headers", array(struct(
        lit("error.message").as("key"),
        lit("boom").cast("binary").as("value"))))
    val shaped = KafkaEdge.toSinkShape(withHeaders, "process-exception.DLT")
    assert(shaped.columns.toSeq == Seq("topic", "key", "value", "headers"))
    val expected = ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", BinaryType))), containsNull = false)
    assert(shaped.schema("headers").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fieldNames.toSeq == Seq("key", "value"))
    // record schema constant matches the connector contract shape
    assert(KafkaEdge.recordSchema.fieldNames.toSeq ==
      Seq("key", "value", "topic", "partition", "offset", "timestamp",
        "timestampType", "headers"))
  }

  test("sendWithFallback DLQs failed sends with the producer message, record-granular") {
    // fault-injected sender: values larger than 8 bytes "fail" with a
    // producer-style message (reference handler semantics: ANY producer
    // exception -> DLT with its message, other records continue —
    // DeadLetterProductionExceptionHandler.java:26-45)
    val sender = new KafkaEdge.RecordSender {
      def send(key: Array[Byte], value: Array[Byte]): Option[String] =
        if (value != null && value.length > 8)
          Some(s"org.apache.kafka.common.errors.TimeoutException: " +
            s"Expiring 1 record(s): ${value.length} bytes")
        else None
    }
    val df = Seq(
      ("k1", "short"),
      ("k2", "a value well over the limit"),
      ("k3", "tiny")).toDF("key", "value")
    val failures = KafkaEdge.sendWithFallback(df, sender).collect()
    assert(failures.length == 1, "only the failing record is DLQ'd")
    val r = failures.head
    assert(new String(r.getAs[Array[Byte]]("key"), "UTF-8") == "k2")
    assert(new String(r.getAs[Array[Byte]]("value"), "UTF-8")
      == "a value well over the limit", "original value preserved")
    val hs = r.getAs[Seq[org.apache.spark.sql.Row]]("headers")
      .map(h => h.getString(0) -> new String(h.getAs[Array[Byte]](1), "UTF-8"))
      .toMap
    assert(hs("error.message").startsWith(
      "org.apache.kafka.common.errors.TimeoutException"))
  }

  test("ReflectiveKafkaSender degrades to per-record DLT routing without kafka-clients") {
    // this sandbox has no kafka-clients jar, so the reflective binding
    // must fail CLOSED: every send reports the binding error as a
    // producer message (→ production DLT), never throws into the task
    val sender = new graft.sources.ReflectiveKafkaSender("broker:9092", "out")
    val err = sender.send("k".getBytes, "v".getBytes)
    assert(err.isDefined && err.get.contains("kafka producer unavailable"))
    // ...and it composes with the record-granular fallback path
    val df = Seq(("k1", "v1"), ("k2", "v2")).toDF("key", "value")
    val failures = KafkaEdge.sendWithFallback(df, sender).collect()
    assert(failures.length == 2)
    // executor shipping: the sender must survive JVM serialization
    // with its transient binding re-resolved on the other side
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(sender)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.sources.ReflectiveKafkaSender]
    assert(back.send("k".getBytes, "v".getBytes).isDefined)
  }

  test("sendWithDltFallback routes failures through the DLT sink exactly once") {
    var sunk: Seq[org.apache.spark.sql.Row] = Seq.empty
    val sender = new KafkaEdge.RecordSender {
      def send(key: Array[Byte], value: Array[Byte]): Option[String] =
        if (new String(key, "UTF-8") == "bad") Some("boom") else None
    }
    val df = Seq(("ok", "v1"), ("bad", "v2")).toDF("key", "value")
    KafkaEdge.sendWithDltFallback(df, sender, b => sunk = b.collect().toSeq)
    assert(sunk.map(r => new String(r.getAs[Array[Byte]]("key"), "UTF-8")) == Seq("bad"))
  }
}
