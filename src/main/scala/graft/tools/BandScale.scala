package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.relational.Tables

/** Banding-rule verification probe (dev tool, r11 — VERDICT r10 #2):
  * measures, per corpus and band width, the sign-LSH candidate-pair
  * volume Σ n·(n−1)/2 over (band, bucket) occupancies — computed
  * from ONE bands aggregate, no pair join, so the table is cheap even
  * where the join itself would be quadratic — plus max/p99 bucket.
  * This is the quantity the mechanized rule bits = ⌈log₂(N/128)⌉
  * controls; the rule's prediction is that candidate volume at the
  * AUTO width stays ~N·occupancy (linear) while any fixed width
  * degrades ~N²/2^bits. A second pass times the actual knnGraph at
  * the auto width and (optionally) a fixed comparison width.
  *
  * Usage: BandScale <sfDirOrName>... [env BANDSCALE_TIME=auto,8]
  */
object BandScale {
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
      else Seq("sf0.01", "sf0.1", "target/probe/sf1full")
    println("sf,n_vecs,bits,auto_bits,cand_pairs,max_bucket,p99_bucket," +
      "occupancy_target_pairs")
    sfs.foreach { sf =>
      val dir = if (sf.contains("/")) sf else s"/root/testdata/$sf"
      val e = Tables.embeddings(spark, dir).localCheckpoint(true)
      val n = e.count()
      val auto = Similarity.autoBits(n)
      (4 to 16).foreach { bits =>
        val occ = Dedup.vectorBands(e, 4, bits)
          .groupBy("band", "bucket").agg(count(lit(1)).as("c"))
          .agg(sum(expr("c * (c - 1) DIV 2")).cast("long").as("pairs"),
            max("c").as("mx"),
            expr("percentile(c, 0.99D)").as("p99")).head()
        // the rule's design point: pairs if every bucket held exactly
        // the target occupancy = bands * 2^bits * occ*(occ-1)/2
        val occTarget = n.toDouble / (1L << bits)
        val target = (4L * (1L << bits) *
          (occTarget * (occTarget - 1) / 2)).toLong.max(0L)
        println(s"$sf,$n,$bits,$auto,${occ.getLong(0)},${occ.getLong(1)}," +
          s"${occ.getDouble(2)},$target")
      }
      // wall of the real graph at the widths under comparison
      sys.env.getOrElse("BANDSCALE_TIME", "").split(',')
        .filter(_.nonEmpty).foreach { w =>
          val t0 = System.nanoTime()
          val g = if (w == "auto") Similarity.knnGraphAuto(e)
            else Similarity.knnGraph(e, bitsPerBand = w.toInt)
          val rows = g.count()
          println(f"time,$sf,$w,${(System.nanoTime() - t0) / 1e9}%.1f," +
            s"$rows")
        }
    }
    spark.stop()
  }
}
