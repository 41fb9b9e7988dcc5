package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketed co-located join: writing both sides bucketed by the join
  * key lets Spark join WITHOUT a shuffle on either side — the
  * pre-partitioning replaces the exchange, which at 100 TB is the
  * difference between a metadata operation and moving the table.
  * Asserted: the bucketed join plan contains NO Exchange, while the
  * plain-parquet join of the same data does. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join without a shuffle; unbucketed ones don't") {
    // warehouse.dir is static; the shared session's default (under
    // the sbt working dir) is fine for managed test tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")

      val bucketed = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      // the aggregate may exchange on the GROUP key, but the join
      // itself must not shuffle either side: no exchange below the join
      val joinSection = bucketedPlan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin") ||
        bucketedPlan.contains("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n$joinSection")

      val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning(l_orderkey") ||
        plainPlan.contains("Exchange hashpartitioning(o_orderkey"),
        "expected the unbucketed join to shuffle")

      // and the results agree
      val a = bucketed.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      val b = plain.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      assert(a.sameElements(b))
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
