package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe (not part of the product surface).
  *
  * r8: adjudicate the dd_lsh_verified 1.5 → 2.5 s regression
  * (VERDICT r7 "What's wrong #2"). Measures lshVerified at sf0.1
  * (a) isolated cold session, checkpointed shingles;
  * (b) isolated, rescan (no checkpoint);
  * (c) both again AFTER the session accumulates the executor-storage
  *     footprint of a long bench run (many live localCheckpoints) —
  *     the suspected interaction: localCheckpoint(true) blocks are
  *     only freed when the referencing DataFrame is GC'd, so a
  *     181-query session carries dead blocks that push new
  *     checkpoints to disk.
  */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  private def materialize(df: DataFrame): Unit = {
    val h = xxhash64(df.columns.map(col): _*)
    df.select(h.as("h")).agg(expr("bit_xor(h)")).collect()
    ()
  }

  /** r9 probe: blockerRecallReport wall time after the shared
    * hashed-shingle build + row-local sample restriction (compare
    * against the 7.5 s r8 bench record). `runMain graft.tools.Scratch
    * blocker [sfDir]`. */
  private def blockerMain(sfDir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(): Unit =
      materialize(graft.operators.Dedup.blockerRecallReport(docs))
    def clean(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    run(); clean()
    for (i <- 1 to 3) { time(s"blockerRecallReport #$i")(run()); clean() }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("blocker")) {
      blockerMain(args.lift(1).getOrElse("/root/testdata/sf0.1"))
      return
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[scratch] docs = ${docs.count()}")

    def runCk(): Unit = materialize(graft.operators.Dedup
      .lshVerifiedImpl(docs, 3, 500000L, 8, 2, None,
        checkpointShingles = true))
    def runRescan(): Unit = materialize(graft.operators.Dedup
      .lshVerifiedImpl(docs, 3, 500000L, 8, 2, None,
        checkpointShingles = false))

    // warmup (codegen/JIT) once per variant, then 3 timed runs each
    runCk(); runRescan()
    for (i <- 1 to 3) time(s"isolated checkpoint #$i")(runCk())
    for (i <- 1 to 3) time(s"isolated rescan     #$i")(runRescan())

    // Simulate the long-session storage footprint: hold 60 live
    // localCheckpoints (~the count a 181-query bench pass creates)
    // of a mid-sized shuffled table, then re-measure.
    val ballast = (1 to 60).map { i =>
      spark.range(0L, 2000000L, 1L, 32)
        .select((col("id") * i).as("k"),
          md5(col("id").cast("string")).as("v"))
        .localCheckpoint(true)
    }
    println(s"[scratch] ballast held: ${ballast.size} checkpoints, " +
      s"storage used = ${spark.sparkContext.getExecutorMemoryStatus}")
    for (i <- 1 to 3) time(s"pressured checkpoint #$i")(runCk())
    for (i <- 1 to 3) time(s"pressured rescan     #$i")(runRescan())
    spark.stop()
  }
}
