package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity
import graft.relational.Tables

/** Ad-hoc r5 probe: trained-vs-sampled PQ recall as a function of
  * Lloyd iterations and codebook size (dev tool). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("corpus,nCodes,iters,recall_sampled,recall_trained,adc_err_sampled_ppm,adc_err_trained_ppm")
    args.foreach { dir =>
      import org.apache.spark.sql.functions._
      val raw = Tables.embeddings(spark, dir)
      // PQPROBE_NORM=1: L2-normalize first (the standard cosine-PQ
      // preprocessing - on the unit sphere cosine == dot and the
      // reconstructed-norm asymmetry cancels)
      val e = if (sys.env.get("PQPROBE_NORM").contains("1"))
        raw.select(col("vec_id"),
          transform(col("embedding"), x => (x.cast("double") /
            sqrt(aggregate(transform(col("embedding"),
              y => y.cast("double") * y.cast("double")),
              lit(0.0), (a, v) => a + v))).cast("float")).as("embedding"),
          col("label"))
      else raw
      def pairsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3)))
      val nQ = sys.env.getOrElse("PQPROBE_NQ", "8").toInt
      val brute = pairsOf(Similarity.knnBrute(e, nQueries = nQ)).toMap
      def recall(got: Array[((Long, Long), Long)]): Double =
        got.map(_._1).count(brute.contains).toDouble / brute.size
      def adcErr(page: org.apache.spark.sql.DataFrame): Long = {
        val approx = pairsOf(page)
        val exact = pairsOf(Similarity.rerank(e, page, nQueries = nQ, k = 20)).toMap
        val errs = approx.flatMap { case (k2, v) => exact.get(k2).map(x => math.abs(v - x)) }
        if (errs.isEmpty) 0L else errs.sum / errs.length
      }
      for (nc <- Seq(16, 64); it <- Seq(2, 6)) {
        val ps = Similarity.knnIvfPq(e, nQueries = nQ, k = 20, nCodes = nc)
        val pt = Similarity.knnIvfPqTrained(e, nQueries = nQ, k = 20, nCodes = nc, iters = it)
        val rs = recall(pairsOf(Similarity.knnIvfPq(e, nQueries = nQ, nCodes = nc)))
        val rt = recall(pairsOf(Similarity.knnIvfPqTrained(e, nQueries = nQ, nCodes = nc, iters = it)))
        println(f"$dir,$nc,$it,$rs%.3f,$rt%.3f,${adcErr(ps)},${adcErr(pt)}")
      }
    }
    spark.stop()
  }
}
