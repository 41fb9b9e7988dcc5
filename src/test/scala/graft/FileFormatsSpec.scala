package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.FileFormats

/** Round-trip fidelity for the CSV/JSON/parquet edges with explicit
  * schemas (no inference pass) and partitioned layout. */
class FileFormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def sample = Seq((1L, "alpha", 1.5), (2L, "beta", -0.25),
    (3L, "gamma", 100.0)).toDF("id", "name", "score")

  test("csv round trip preserves values under explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    FileFormats.writeCsv(sample, dir)
    val back = FileFormats.readCsv(spark, dir, schema)
      .orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      == Seq((1L, "alpha", 1.5), (2L, "beta", -0.25), (3L, "gamma", 100.0)))
  }

  test("json-lines round trip with partitioned layout prunes on read") {
    val dir = Files.createTempDirectory("graft_json").toString
    FileFormats.writeJsonLines(sample.withColumn("part", col("id") % 2),
      dir, partitionBy = Seq("part"))
    val full = StructType(schema.fields)
    val back = FileFormats.readJsonLines(spark, dir, full)
    // partition-pruned read: only files under part=1 are scanned
    val pruned = back.where(col("part") === 1)
    assert(pruned.count() == 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.inputFiles
      .forall(_.contains("part=1")))
  }

  test("orc round trip preserves values and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    FileFormats.writeOrc(sample, dir)
    val back = FileFormats.readOrc(spark, dir, schema)
    val got = back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "alpha", 1.5), (2L, "beta", -0.25),
      (3L, "gamma", 100.0)))
    // predicate reaches the ORC scan (search-argument pushdown)
    val plan = back.where(col("id") === 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,2)]")
      || plan.contains("EqualTo(id,2)"), s"no pushed filter in:\n$plan")
  }

  test("packed shards write as a partitioned training layout and prune on read") {
    // end of the pipeline: token packing -> partitionBy(lang, shard_id)
    // = one directory per training shard, readable with partition
    // pruning (a trainer pulls one shard without scanning the corpus)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val packed = graft.operators.TextAnalysis.tokenPackBy(docs, "lang",
      shardTokens = 512L)
    val dir = Files.createTempDirectory("graft_shards").toString
    FileFormats.writeParquet(
      packed.join(docs.select("doc_id", "text"), "doc_id"),
      dir, partitionBy = Seq("lang", "shard_id"))
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    val one = back.where(col("lang") === "en" && col("shard_id") === 0)
    assert(one.count() > 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("lang") && plan.contains("shard_id"),
      s"partition filters not pushed:\n$plan")
    // shard budget: every (lang, shard) holds <= 512 tokens + one
    // overflow doc (the doc that crossed the boundary)
    val sums = back.groupBy("lang", "shard_id")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"),
        org.apache.spark.sql.functions.max("n_tokens").as("mx"))
      .collect()
    sums.foreach { r =>
      // NB: partition columns round-trip as INT (path-inferred)
      assert(r.getLong(2) <= 512L + r.getLong(3),
        s"shard ${r.getString(0)}/${r.get(1)} over budget")
    }
  }

  test("undecodable csv rows null out (safe-decode contract, PERMISSIVE)") {
    val dir = Files.createTempDirectory("graft_badcsv")
    Files.writeString(dir.resolve("data.csv"), "id,name,score\n1,ok,2.5\nnotanint,bad,xyz\n")
    val back = FileFormats.readCsv(spark, dir.toString, schema).collect()
    assert(back.length == 2)
    val bad = back.find(_.isNullAt(0)).get
    assert(bad.isNullAt(2))
  }
}
