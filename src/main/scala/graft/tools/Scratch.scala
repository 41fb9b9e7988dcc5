package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe (not part of the product surface). */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    import graft.functions.TextOps
    val sh = docs.select(col("doc_id"),
      explode(TextOps.wordShingles(col("text"), 3)).as("sh"))
    (1 to 2).foreach { i =>
      time(s"shingle explode $i")(println(sh.count()))
      time(s"shingle hash $i")(println(sh.select(
        graft.functions.PortableHash.h31(col("sh")).as("h")).agg(sum("h")).head))
      val joined = sh.select(col("doc_id").as("a"), col("sh"))
        .join(sh.select(col("doc_id").as("b"), col("sh")), "sh")
        .where(col("a") < col("b"))
      time(s"join count $i")(println(joined.count()))
      val agg = joined.groupBy("a", "b").agg(count(lit(1)).as("n"))
      time(s"pair agg $i")(println(agg.count()))
    }
    spark.stop()
  }
}
