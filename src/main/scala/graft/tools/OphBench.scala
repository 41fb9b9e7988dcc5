package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.relational.Tables

/** Signature-construction cost probe (dev tool, not product surface):
  * K-affine MinHash vs one-permutation hashing on the same corpus —
  * the map-side CPU comparison behind declaring OPH the 100 TB
  * signature path. Also records pair-set agreement between the two
  * LSH families (they estimate the same Jaccard, but band on
  * different signatures, so candidate sets differ on near-threshold
  * pairs — agreement on the ≥750k-ppm dup pairs is what matters for
  * dedup recall). Output goes to BASELINE.md's journal. */
object OphBench {
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
      else Seq("sf0.01", "sf0.1")
    val reps = sys.env.getOrElse("OPH_REPS", "3").toInt
    println("sf,n_docs,affine_sig_s,oph_sig_s,affine_pairs,oph_pairs," +
      "affine_dup750k,oph_dup750k,dup_common")
    sfs.foreach { sf =>
      val dir = if (sf.contains("/")) sf else s"/root/testdata/$sf"
      val docs = Tables.documents(spark, dir)
      val nDocs = docs.count()
      def timeIt(f: => Long): (Double, Long) = {
        var out = 0L
        // warm once, then median-free best-of-reps (shared-host noise)
        f
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          out = f
          (System.nanoTime() - t0) / 1e9
        }
        (times.min, out)
      }
      val (tAff, _) = timeIt(Dedup.minhashSignatures(docs).count())
      val (tOph, _) = timeIt(Dedup.ophSignatures(docs).count())
      val affPairs = Dedup.minhashLsh(docs).cache()
      val ophPairs = Dedup.ophLsh(docs).cache()
      val nAff = affPairs.count(); val nOph = ophPairs.count()
      val affDup = affPairs.where(col("est_jaccard_ppm") >= 750000)
        .select("doc_a", "doc_b")
      val ophDup = ophPairs.where(col("est_jaccard_ppm") >= 750000)
        .select("doc_a", "doc_b")
      val nAffDup = affDup.count(); val nOphDup = ophDup.count()
      val common = affDup.intersect(ophDup).count()
      affPairs.unpersist(); ophPairs.unpersist()
      println(f"$sf,$nDocs,$tAff%.2f,$tOph%.2f,$nAff,$nOph," +
        s"$nAffDup,$nOphDup,$common")
      // end-to-end blocker wall at the AUTO arm (r13, VERDICT r12
      // #4): the flagship path signs with the K-affine family —
      // measure whether swapping OPH in moves the whole-blocker wall
      // or only the (small) signature slice of it
      val r = Dedup.autoBandRows(Dedup.minhashSignatures(docs).count())
      val k = graft.functions.PortableHash.MinhashK
      val (tAffAuto, _) = timeIt(Dedup.minhashLshAuto(docs).count())
      val (tOphAuto, _) = timeIt(
        Dedup.ophLsh(docs, bands = k / r, rowsPerBand = r).count())
      println(f"auto_arm,$sf,r=$r,affine_auto_s=$tAffAuto%.2f," +
        f"oph_auto_s=$tOphAuto%.2f")
    }
    spark.stop()
  }
}
