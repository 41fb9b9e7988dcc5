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
}
