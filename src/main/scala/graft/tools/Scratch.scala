package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe (not part of the product surface). */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    println(s"[scratch] docs = $n, all pairs = ${n * (n - 1) / 2}")

    val fp = graft.operators.Dedup.simhash(docs).localCheckpoint(true)
    val allp = {
      val a = fp.select(col("doc_id").as("a"), col("simhash48").as("fa"))
      val b = fp.select(col("doc_id").as("b"), col("simhash48").as("fb"))
      a.crossJoin(b).where(col("a") < col("b"))
        .select(bit_count(expr("fa ^ fb")).as("d")).localCheckpoint(true)
    }
    for (d <- Seq(1, 2, 3, 4, 6, 8))
      println(s"[scratch] true hamming<=$d pairs = ${allp.where(col("d") <= d).count()}")

    def chunk(chunkBits: Int)(b: Int) =
      floor(col("simhash48") / lit(math.pow(2, b * chunkBits)))
        .cast("long") % (1L << chunkBits)

    /** banded table keyed by an arbitrary set of bucket expressions. */
    def banded(keys: Seq[org.apache.spark.sql.Column]): DataFrame =
      fp.select(col("doc_id"), col("simhash48"), posexplode(array(keys: _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")

    def probe(label: String, keys: Seq[org.apache.spark.sql.Column],
              maxHam: Int): Unit = {
      val bt = banded(keys)
      val cand = bt.select(col("band"), col("chunk"), col("doc_id").as("doc_a"),
          col("simhash48").as("fa"))
        .join(bt.select(col("band"), col("chunk"), col("doc_id").as("doc_b"),
          col("simhash48").as("fb")), Seq("band", "chunk"))
        .where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b", "fa", "fb").distinct().localCheckpoint(true)
      val nc = cand.count()
      val found = cand.where(bit_count(expr("fa ^ fb")) <= maxHam).count()
      val mx = bt.groupBy("band", "chunk").agg(count(lit(1)).as("n"))
        .agg(max("n")).head().getLong(0)
      println(s"[probe] $label: cand=$nc (${100.0 * nc / (n * (n - 1) / 2)}%%), " +
        s"found(d<=$maxHam)=$found, maxBucket=$mx")
    }

    // single-chunk blockings
    probe("chunk12 d<=8", (0 until 4).map(chunk(12)), 8)
    probe("chunk16 d<=8", (0 until 3).map(chunk(16)), 8)
    probe("chunk24 d<=8", (0 until 2).map(chunk(24)), 8)
    // 2-of-4 12-bit pairs (24-bit keys, 6 bands), d<=2 guarantee
    val pairs12 = for { i <- 0 until 4; j <- i + 1 until 4 } yield
      chunk(12)(i) * (1L << 12) + chunk(12)(j)
    probe("pair12 d<=8", pairs12, 8)
    probe("pair12 d<=3", pairs12, 3)
    // Manku 3-of-6 8-bit triples (24-bit keys, 20 bands), d<=3 EXACT
    val triples8 = for { i <- 0 until 6; j <- i + 1 until 6; k <- j + 1 until 6 }
      yield (chunk(8)(i) * (1L << 8) + chunk(8)(j)) * (1L << 8) + chunk(8)(k)
    probe("manku 3of6x8 d<=3", triples8, 3)
    spark.stop()
  }
}
