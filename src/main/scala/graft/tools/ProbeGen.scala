package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side probe-corpus generator (dev tool, not product
  * surface): synthesizes an ~Nx larger documents + embeddings pair
  * from an existing SF directory so the scale probes (LshScale /
  * ClusterScale) can run one order of magnitude past the driver
  * testdata. Deterministic: copy c of a doc appends the token " v<c>"
  * (a one-token near-duplicate — the worst case for LSH blockers:
  * every base doc gains `copies-1` high-Jaccard variants, making the
  * corpus strictly MORE boilerplate-heavy than the source); copy c of
  * an embedding perturbs one component by 0.001*c (keeps variants
  * inside the same cosine neighborhoods). Output under target/probe/
  * (gitignored) — never under /root/testdata.
  */
object ProbeGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "target/probe/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until copies).map { c =>
      if (c == 0) docs
      else docs.select(
        (col("doc_id") + lit(c * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" v$c")).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + lit(s" v$c".length.toLong)).as("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until copies).map { c =>
      if (c == 0) emb
      else emb.select(
        (col("vec_id") + lit(c * 1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === pmod(lit(c), size(col("embedding"))),
            x + lit(0.001f * c)).otherwise(x)).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"[probegen] wrote ${copies}x $src -> $out")
    spark.stop()
  }
}
