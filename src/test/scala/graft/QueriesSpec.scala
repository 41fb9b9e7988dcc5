package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sanity layer over the declared t2 surface (the real gate is the
  * driver's DuckDB hash compare; this catches regressions earlier):
  * row counts at sf0.001 + column names + split totality. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every declared query has an oracle and runs non-empty at sf0.001") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("oracle column names match the Spark result column names") {
    // The driver sorts columns by name before hashing — mismatched
    // aliases would hash-mismatch even with identical values.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(SparkEntry.queries.contains(name), s"oracle $name has no query")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      assert(SparkEntry.oracleSql.contains(name)
        || name.startsWith("x_"), s"query $name has no oracle")
    }
  }

  test("split branches partition events exactly (Q1 + Q2 == all rows)") {
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    val q1 = SparkEntry.queries("t2_q1_split_ok")(spark, sf).count()
    val q2 = SparkEntry.queries("t2_q2_split_dead")(spark, sf).count()
    assert(q1 + q2 == total)
  }

  test("flagship entry returns per-branch counts covering all events") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == 1000, s"all sf0.001 events routed, got $total")
  }
}
