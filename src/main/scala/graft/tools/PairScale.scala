package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, Multimodal}
import graft.relational.Tables

/** Scale probe for the r6 pair-producing operators (dev tool, not
  * product surface): per SF dir, measures the quantities that decide
  * whether each plan stays near-linear at 100 TB —
  *  - co-order triangle graph: edges, ORIENTED wedge volume (the
  *    degree-ordered join's real cost) vs the naive Σdeg² wedge
  *    volume the orientation avoids, and triangles;
  *  - image perceptual-hash near-dup: banded candidate volume, max
  *    band-bucket occupancy, verified d≤3 pairs;
  *  - sorted-neighborhood: emitted pairs (cost is N·w by
  *    construction — the probe just confirms the output is bounded).
  * Output goes to BASELINE.md's journal. */
object PairScale {
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
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    println("dir,li_rows,tri_edges,tri_wedges_oriented,tri_wedges_naive," +
      "triangles,ph_docs,ph_band_cands,ph_max_bucket,ph_pairs_d3,snm_pairs")
    dirs.foreach { d =>
      // --- triangles: rebuild the operator's exact intermediate shapes
      val l = Tables.lineitem(spark, d).where(col("l_quantity") >= 25)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val liRows = l.count()
      val e = l.as("a").join(l.as("b"), col("a.ok") === col("b.ok"))
        .where(col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("lo"), col("b.pk").as("hi")).distinct()
        .localCheckpoint(true)
      val nE = e.count()
      val deg = e.select(col("lo").as("v"))
        .unionAll(e.select(col("hi").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dg"))
        .localCheckpoint(true)
      val degs = deg.select(col("dg"))
      val naiveWedges = degs.agg(
        sum(expr("dg * (dg - 1) div 2"))).head.getLong(0)
      val oriented = e
        .join(deg.select(col("v").as("lo"), col("dg").as("dlo")), "lo")
        .join(deg.select(col("v").as("hi"), col("dg").as("dhi")), "hi")
      val loFirst = (col("dlo") < col("dhi")) ||
        (col("dlo") === col("dhi") && col("lo") < col("hi"))
      val outdeg = oriented
        .select(when(loFirst, col("lo")).otherwise(col("hi")).as("src"))
        .groupBy("src").agg(count(lit(1)).as("od"))
      val orientedWedges = outdeg.agg(
        sum(expr("od * (od - 1) div 2"))).head.getLong(0)
      val nTri = Graph.coOrderTriangles(Tables.lineitem(spark, d))
        .agg(sum("n_triangles")).head.getLong(0) / 3
      // --- image phash near-dup
      val ph = Multimodal.imagePhash(Tables.documents(spark, d))(spark)
        .localCheckpoint(true)
      val nPh = ph.count()
      val bandKeys = array(
        col("hash_lo") % (1L << 16),
        floor(col("hash_lo") / (1L << 16)).cast("long") % (1L << 16),
        col("hash_hi") % (1L << 16),
        floor(col("hash_hi") / (1L << 16)).cast("long") % (1L << 16))
      val banded = ph.where(col("hash_hi") >= 0)
        .select(col("doc_id"), posexplode(bandKeys))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
        .groupBy("band", "bucket").agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val cands = banded.agg(sum(expr("n * (n - 1) div 2")))
        .head.getLong(0)
      val maxBucket = banded.agg(max("n")).head.getLong(0)
      val pairsD3 = Dedup.imageNearDup(ph).count()
      // --- sorted neighborhood
      val snm = Dedup.sortedNeighborhood(Tables.documents(spark, d)).count()
      println(s"$d,$liRows,$nE,$orientedWedges,$naiveWedges,$nTri," +
        s"$nPh,$cands,$maxBucket,$pairsD3,$snm")
    }
    spark.stop()
  }
}
