package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Measurement harness for the tx_ngram_lm broadcast-model claim:
  * the score-side join is broadcast, which is only honest if the
  * PRUNED bigram model stays bounded as the corpus grows. This
  * prints, per corpus: doc count, bigram occurrences (the token
  * stream the fit aggregates), distinct bigrams (unpruned model),
  * pruned rows (count ≥ 2 — the declared artifact), and the pruned
  * fraction — the sub-linearity of the pruned column is the
  * evidence. Run: `runMain graft.tools.LmScale <dir>...` */
object LmScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "target/probe/sf1full")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("| corpus | docs | bigram occurrences | distinct bigrams | pruned (c>=2) | pruned/occ |")
    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val pairs = docs
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
        .where(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(w) - 2), " +
            "i -> struct(w[i] AS w1, w[i + 1] AS w2))")).as("b"))
        .select(col("b.w1"), col("b.w2"))
      val nDocs = docs.count()
      val occ = pairs.count()
      val counts = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val distinct = counts.count()
      val pruned = counts.where(col("c12") >= 2).count()
      println(f"| $dir | $nDocs | $occ | $distinct | $pruned | ${pruned.toDouble / occ}%.4f |")
    }
    spark.stop()
  }
}
