package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-generated testdata
  * (see TESTDATA.md). Schemas are fixed per table, mirroring how the
  * reference fixes types per topic edge via Serdes
  * (reference: src/main/java/de/tg/kafka/streams/dead/letter/topology/ErrorHandlingTopology.java:30).
  * Parquet scans benefit from Catalyst column pruning + predicate
  * pushdown automatically — every query below selects/filters before
  * any wide transform so the scan stays narrow.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is presented as epoch-NANOS BIGINT regardless of how
    * the parquet types it. Generator history: the testdata has shipped
    * both as int64 nanos (read natively as LongType under
    * `legacy.parquet.nanosAsLong`) and as timestamp[us] (read as
    * TIMESTAMP_NTZ, which Spark refuses to CAST to BIGINT). Every
    * event-time operator here and every DuckDB oracle (`epoch_ns(ts)`)
    * computes on naive-UTC epoch nanos, so the loader is the single
    * place that absorbs the representation: all sessions pin
    * `spark.sql.session.timeZone=UTC`, making NTZ→LTZ a wall-clock
    * identity and `unix_micros` the naive-as-UTC epoch. The projection
    * is codegen'd arithmetic on the scan — no shuffle, pruning intact. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case _ =>
        // The NTZ→epoch conversion below is a wall-clock identity ONLY
        // under a UTC session; enforce the invariant where it is relied
        // on rather than trusting every caller's builder to pin it.
        val tz = spark.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"Tables.events requires spark.sql.session.timeZone=UTC " +
            s"(got $tz): the timestamp[us] vintage is naive-UTC and any " +
            s"other zone would silently shift all event times")
        raw.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000"))
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
}
