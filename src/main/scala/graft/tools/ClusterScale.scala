package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Cluster, Dedup}
import graft.relational.Tables

/** Scale-robustness probe for the r2 clustering/decontamination
  * families (dev tool, not product surface): per SF, k-means cluster
  * occupancy (which bounds the semantic-dedup pair join), semdedup
  * drop volume, and contamination candidate volume (corpus-side rows
  * that reach the broadcast join's probe). Output goes to BASELINE.md's
  * journal. */
object ClusterScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("sf0.001", "sf0.01", "sf0.1")
    println("sf,n_vecs,km8_max_cluster,km8_p99_cluster,km8_pairs," +
      "auto_k,auto_max_cluster,auto_p99_cluster,auto_pairs,sem_auto_dropped," +
      "contam_eval_shingles,contam_hit_rows,contam_docs")
    sfs.foreach { sf =>
      // bare SF names resolve to the driver testdata; paths pass through
      val dir = if (sf.contains("/")) sf else s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, dir)
      val nVecs = emb.count()
      def occStats(assign: org.apache.spark.sql.DataFrame) =
        assign.groupBy("cid").agg(count(lit(1)).as("n"))
          .agg(max("n").as("mx"), expr("percentile(n, 0.99D)").as("p99"),
            // within-cluster pair-join volume = sum n*(n-1)/2
            sum(expr("n * (n - 1) DIV 2")).as("pairs")).head()
      // fixed k=8 (the pinned-oracle anchor): pair volume measured
      // ANALYTICALLY from occupancy — executing the quadratic join at
      // the probe scale is exactly what the auto path exists to avoid
      val occ = occStats(Cluster.kmeansAssign(emb))
      // sqrt(N) auto path: occupancy + the semdedup join actually run
      val autoK = math.max(8, math.sqrt(nVecs.toDouble).toInt)
      val occAuto = occStats(Cluster.kmeansAssign(emb, autoK))
      val semDropped = Cluster.semDedup(emb, autoK)
        .where(col("kept") === 0).count()
      val docs = Tables.documents(spark, dir)
      val sh = docs.select(col("doc_id"),
        explode(graft.functions.TextOps.wordShingles(col("text"), 5)).as("sh"))
      val evalSh = sh.where(col("doc_id") % 19 === 0).count()
      val contam = Dedup.contamination(docs)
      val hitRows = contam.agg(sum("n_hits")).head().getLong(0)
      val contamDocs = contam.count()
      println(s"$sf,$nVecs,${occ.getLong(0)},${occ.getDouble(1)},${occ.get(2)}," +
        s"$autoK,${occAuto.getLong(0)},${occAuto.getDouble(1)},${occAuto.get(2)}," +
        s"$semDropped,$evalSh,$hitRows,$contamDocs")
    }
    // big-k probe (r5): the k ≥ 1024 assign must still run with a
    // bounded plan — the native CentroidArgmin path (k > 512) carries
    // the codebook as ONE reference object, where the k-literal
    // least() form stops codegen'ing near k ≈ 10³. Prints wall time
    // and populated-cluster count for the native form, plus the same
    // k forced through the literal form for an on-record contrast
    // (expected: codegen fallback / much slower, possibly far slower
    // to even plan).
    if (sys.env.get("SPARK_GRAFT_BIGK").exists(_.nonEmpty)) {
      val k = sys.env("SPARK_GRAFT_BIGK").toInt
      val dir = "/root/testdata/sf0.1"
      val emb = Tables.embeddings(spark, dir)
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"bigk,$label,$k,${(System.nanoTime() - t0) / 1e9}%.2f,$n")
      }
      time("native")(Cluster.kmeansAssign(emb, k, iters = 1)
        .select("cid").distinct().count())
      time("literal")(Cluster.kmeansAssign(emb, k, iters = 1,
        literalArgminMaxK = Int.MaxValue)
        .select("cid").distinct().count())
    }
    spark.stop()
  }
}
