package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe reproducing the BENCH_r03 regressions (not part
  * of the product surface). */
object R4Probe {
  private def materialize(df: DataFrame): Unit = {
    val h = xxhash64(df.columns.map(col): _*)
    df.select(h.as("h")).agg(expr("bit_xor(h)")).collect()
    ()
  }

  def time(label: String)(f: => Unit): Unit = {
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[probe] $label: min=${times.min}%.2fs runs=${times.map(t => f"$t%.2f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("entry")) {
      val rows = graft.SparkEntry.entry(spark).collect()
      println(s"[probe] entry rows=${rows.length}: ${rows.mkString(", ")}")
      spark.stop(); return
    }
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[probe] docs=${docs.count()} " +
      s"avgLen=${docs.select(avg(length(col("text")))).collect()(0)}")

    time("minhashSignatures (native expr)") {
      materialize(Dedup.minhashSignatures(docs))
    }
    val aggSig = Dedup.getClass.getDeclaredMethods
      .find(_.getName == "minhashSignaturesAgg").get
    time("minhashSignaturesAgg (agg form)") {
      materialize(aggSig.invoke(Dedup, docs, Integer.valueOf(3))
        .asInstanceOf[DataFrame])
    }
    time("simhash (native expr)") { materialize(Dedup.simhash(docs)) }
    time("minhashLsh full") { materialize(Dedup.minhashLsh(docs)) }
    spark.stop()
  }
}
