package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.relational.Tables

/** Scale-robustness probe for the LSH dedup family (dev tool, not
  * product surface): per SF, measures corpus size vs candidate-pair
  * volume and bucket occupancy — the quantities that decide whether
  * the banded self-join stays near-linear at 100 TB — and the effect
  * of the `maxBucketSize` skew guard. Output goes to BASELINE.md's
  * journal. */
object LshScale {
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
    println("sf,n_docs,mh_cand_pairs,mh_cand_pairs_cap100,mh_dup_pairs_750k," +
      "mh_max_bucket,mh_p99_bucket,sh_cand_pairs,sh_pairs_ham8," +
      "shw_cand_pairs,shw_max_bucket,shw_pairs_d3,curated_rows")
    sfs.foreach { sf =>
      // bare SF names resolve to the driver testdata; absolute or
      // relative paths (e.g. target/probe/sf1 from ProbeGen) pass through
      val dir = if (sf.contains("/")) sf else s"/root/testdata/$sf"
      val docs = Tables.documents(spark, dir)
      val nDocs = docs.count()
      val mh = Dedup.minhashLsh(docs)
      val mhCand = mh.count()
      val mhCandCap = Dedup.minhashLsh(docs, maxBucketSize = Some(100)).count()
      val mhDup = mh.where(col("est_jaccard_ppm") >= 750000).count()
      val occ = Dedup.minhashBands(docs)
        .groupBy("band", "bucket").agg(count(lit(1)).as("n"))
        .agg(max("n").as("mx"),
          expr("percentile(n, 0.99D)").as("p99")).head()
      // LSHSCALE_SKIP_QUADRATIC=1: past ~100k docs the 12-bit anchor's
      // distinct-pair join is the very quadratic this table exists to
      // demonstrate (~5.6% of ALL pairs — billions at 500k docs), so
      // report its COST via the occupancy identity Σn(n−1)/2 instead
      // of materializing it (join-input volume, pre-distinct), and
      // skip the anchor's verified output (-1 sentinel).
      val skipQuad = sys.env.get("LSHSCALE_SKIP_QUADRATIC").contains("1")
      val shCand = { // simhash banded candidates BEFORE the hamming verify
        val fp = Dedup.simhash(docs)
        val chunkBits = 12
        val banded = fp.select(col("doc_id"),
          posexplode(array((0 until 48 / chunkBits).map { b =>
            floor(col("simhash48") / lit(math.pow(2, b * chunkBits)))
              .cast("long") % (1L << chunkBits)
          }: _*)))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
        if (skipQuad)
          banded.groupBy("band", "chunk").agg(count(lit(1)).as("n"))
            .agg(sum(expr("n * (n - 1) DIV 2")).cast("long")).head().getLong(0)
        else
          banded.select(col("band"), col("chunk"), col("doc_id").as("doc_a"))
            .join(banded.select(col("band"), col("chunk"), col("doc_id").as("doc_b")),
              Seq("band", "chunk"))
            .where(col("doc_a") < col("doc_b"))
            .select("doc_a", "doc_b").distinct().count()
      }
      val shPairs = if (skipQuad) -1L else Dedup.simhashPairs(docs).count()
      // wide blocker (Manku 3-of-6 triple keys): candidate volume +
      // bucket occupancy of the EXACT d<=3 scheme
      val (shwCand, shwMax) = {
        val fp = Dedup.simhash(docs)
        def chunk(b: Int) =
          floor(col("simhash48") / lit(math.pow(2, b * 8)))
            .cast("long") % (1L << 8)
        val keys = for { i <- 0 until 6; j <- i + 1 until 6; k <- j + 1 until 6 }
          yield (chunk(i) * (1L << 8) + chunk(j)) * (1L << 8) + chunk(k)
        val banded = fp.select(col("doc_id"), posexplode(array(keys: _*)))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
          .localCheckpoint(true)
        val cand = banded.select(col("band"), col("bucket"), col("doc_id").as("a"))
          .join(banded.select(col("band"), col("bucket"), col("doc_id").as("b")),
            Seq("band", "bucket"))
          .where(col("a") < col("b")).select("a", "b").distinct().count()
        val mx = banded.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
          .agg(max("n")).head().getLong(0)
        (cand, mx)
      }
      val shwPairs = Dedup.simhashPairsWide(docs).count()
      val curated = graft.operators.CuratePipeline.curate(spark, docs).count()
      println(s"$sf,$nDocs,$mhCand,$mhCandCap,$mhDup," +
        s"${occ.getLong(0)},${occ.getDouble(1)},$shCand,$shPairs," +
        s"$shwCand,$shwMax,$shwPairs,$curated")
    }
    spark.stop()
  }
}
