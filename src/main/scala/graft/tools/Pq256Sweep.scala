package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Similarity

/** r6 deployment-default PQ evidence (dev tool): 256-entry
  * Lloyd-trained codebooks — the production PQ default (8-bit codes:
  * one byte per subspace per vector) — swept over nProbe ∈ {1,2,4,8}
  * on a planted-cluster corpus (`ProbeGen clustered`). Records, per
  * nProbe: recall@5 of the raw ADC page vs exact brute-force,
  * recall@5 after the exact re-rank stage, and mean |ADC − exact|
  * cosine distortion (ppm) over the returned page — the BASELINE.md
  * table the ANN story lands on.
  *
  * Usage: runMain graft.tools.Pq256Sweep <corpusDir> [<corpusDir>…]
  * Env: PQ256_NQ (queries, default 40), PQ256_CENTROIDS (default 32),
  * PQ256_ITERS (Lloyd rounds, default 6). */
object Pq256Sweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nQ = sys.env.getOrElse("PQ256_NQ", "40").toInt
    val nCentroids = sys.env.getOrElse("PQ256_CENTROIDS", "32").toInt
    val iters = sys.env.getOrElse("PQ256_ITERS", "6").toInt
    println("corpus,nCentroids,nCodes,iters,nProbe," +
      "recall5_adc,recall5_rerank,adc_err_ppm,wall_s")

    def pairs(df: DataFrame): Array[((Long, Long), Long)] =
      df.collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3)))

    args.foreach { dir =>
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val brute5 = pairs(Similarity.knnBrute(e, nQueries = nQ, k = 5)).toMap
      Seq(1, 2, 4, 8).foreach { np =>
        val t0 = System.nanoTime()
        // PQ256_SAMPLED=1 → sampled codebook (the r4/r5 baseline) for
        // the trained-vs-sampled Δ at the 256-entry default
        val page = (if (sys.env.get("PQ256_SAMPLED").contains("1"))
            Similarity.knnIvfPq(e, nQueries = nQ, k = 20,
              nCentroids = nCentroids, nProbe = np, nCodes = 256)
          else Similarity.knnIvfPqTrained(e, nQueries = nQ, k = 20,
            nCentroids = nCentroids, nProbe = np, nCodes = 256, iters = iters))
          .cache()
        val approx = pairs(page)
        val wall = (System.nanoTime() - t0) / 1e9
        // page rows are (query_id, rank, neighbor_id, cos_ppm); take rank<=5
        val adcTop5 = page.where(org.apache.spark.sql.functions.col("rank") <= 5)
        val r5adc = pairs(adcTop5).map(_._1).count(brute5.contains)
          .toDouble / brute5.size
        val rer = Similarity.rerank(e, page, nQueries = nQ, k = 5)
        val r5rer = pairs(rer).map(_._1).count(brute5.contains)
          .toDouble / brute5.size
        // distortion: exact scores for the whole returned page
        val exact = pairs(Similarity.rerank(e, page, nQueries = nQ, k = 20)).toMap
        val errs = approx.flatMap { case (key, v) =>
          exact.get(key).map(x => math.abs(v - x)) }
        val adcErr = if (errs.isEmpty) 0L else errs.sum / errs.length
        page.unpersist()
        println(f"$dir,$nCentroids,256,$iters,$np,$r5adc%.3f,$r5rer%.3f,$adcErr,$wall%.1f")
        assert(approx.nonEmpty)
      }
    }
    spark.stop()
  }
}
