package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity
import graft.relational.Tables

/** Recall probe for the ANN family (dev tool, not product surface):
  * per SF, recall@5 of each approximate path against the exact
  * brute-force top-5, plus the PQ score distortion (mean |ADC cos −
  * exact cos| over the PQ page) — the honest-quality numbers that
  * belong next to the latency ones in BASELINE.md. */
object SimScale {
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
    println("sf,n_vecs,recall_lsh,recall_ivf,recall_pq,recall_rerank," +
      "pq_mean_abs_err_ppm,pq_max_abs_err_ppm,recall_rerank_cb64," +
      "recall_pq_trained,recall_trained_cb64," +
      // r5 aligned columns: sampled vs trained at the SAME codebook
      // size, with and without the exact re-rank stage
      "recall_pq_cb64,recall_trained_rerank,recall_trained_rerank_cb64")
    sfs.foreach { sf =>
      val dir = if (sf.contains("/")) sf else s"/root/testdata/$sf"
      val e = Tables.embeddings(spark, dir)
      val n = e.count()
      def pairsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3)))
      val brute = pairsOf(Similarity.knnBrute(e)).toMap
      def recall(got: Array[((Long, Long), Long)]): Double =
        got.map(_._1).count(brute.contains).toDouble / brute.size
      val rLsh = recall(pairsOf(Similarity.knnLshBucketed(e)))
      val rIvf = recall(pairsOf(Similarity.knnIvf(e)))
      val pq = pairsOf(Similarity.knnIvfPq(e, k = 20))
      val rPq = recall(pairsOf(Similarity.knnIvfPq(e)))
      val rRe = recall(pairsOf(Similarity.knnIvfPqRerank(e)))
      // ADC distortion over the PQ page, against the exact cosine of
      // the same pairs (brute covers only its top-5, so recompute
      // exact scores for the page via the rerank path's contract:
      // rerank page == pq page re-scored exactly)
      val exact = pairsOf(Similarity.knnIvfPqRerank(e, k = 20)).toMap
      val errs = pq.flatMap { case (k2, v) => exact.get(k2).map(x => math.abs(v - x)) }
      val meanErr = if (errs.nonEmpty) errs.sum / errs.length else 0L
      val maxErr = if (errs.nonEmpty) errs.max else 0L
      // the codebook-size lever: same path, 64 sampled entries
      val rRe64 = recall(pairsOf(
        Similarity.knnIvfPqRerank(e, nCodes = 64)))
      val rTr = recall(pairsOf(Similarity.knnIvfPqTrained(e)))
      val rTr64 = recall(pairsOf(Similarity.knnIvfPqTrained(e, nCodes = 64)))
      val rPq64 = recall(pairsOf(Similarity.knnIvfPq(e, nCodes = 64)))
      // trained + exact re-rank: page from the trained index, same
      // re-rank contract as knnIvfPqRerank
      def trainedRerank(nCodes: Int): Double = {
        val page = Similarity.knnIvfPqTrained(e, k = 20, nCodes = nCodes)
        recall(pairsOf(Similarity.rerank(e, page)))
      }
      val rTrRe = trainedRerank(16)
      val rTrRe64 = trainedRerank(64)
      println(f"$sf,$n,$rLsh%.3f,$rIvf%.3f,$rPq%.3f,$rRe%.3f,$meanErr,$maxErr," +
        f"$rRe64%.3f,$rTr%.3f,$rTr64%.3f,$rPq64%.3f,$rTrRe%.3f,$rTrRe64%.3f")
    }
    spark.stop()
  }
}
