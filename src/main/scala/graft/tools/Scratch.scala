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

  /** r9-continuation probe: where do dd_edit_verified's seconds go —
    * gram build, df-cap, candidate join, or the Levenshtein verify?
    * `runMain graft.tools.Scratch editdup [sfDir]`. */
  private def editDupMain(sfDir: String): Unit = {
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
    val snip = docs.where(length(col("text")) >= 16)
      .select(col("doc_id"), substring(col("text"), 1, 96).as("sn"))
    val grams = snip.select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(1), length(col("sn")) - 15),
        i => col("sn").substr(i, lit(16))))).as("sh"))
    def stage(label: String)(df: DataFrame): Unit = {
      df.count(); // warm
      time(label)(println(s"  rows=${df.count()}"))
    }
    stage("grams")(grams)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("sh")
    val capped = grams.withColumn("df", count(lit(1)).over(w))
      .where(col("df") <= 16).drop("df")
    stage("capped")(capped)
    val cand = capped.select(col("doc_id").as("doc_a"), col("sh"))
      .join(capped.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    stage("candidates")(cand)
    val ver = cand
      .join(snip.select(col("doc_id").as("doc_a"), col("sn").as("sa")), "doc_a")
      .join(snip.select(col("doc_id").as("doc_b"), col("sn").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
      .where(col("dist") <= 24)
    stage("verified")(ver)
    val verB = cand
      .join(snip.select(col("doc_id").as("doc_a"), col("sn").as("sa")), "doc_a")
      .join(snip.select(col("doc_id").as("doc_b"), col("sn").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("sa"), col("sb"), 24).cast("long").as("dist"))
      .where(col("dist") >= 0 && col("dist") <= 24)
    stage("verified bounded")(verB)
    def full(): Unit = materialize(graft.operators.Dedup.editVerified(docs))
    full()
    for (i <- 1 to 3) time(s"editVerified full #$i")(full())
    spark.stop()
  }

  /** r10 probe: dd_code_neardup stage costs — is the gram build
    * paying the interpreted-HOF re-evaluation tax on the
    * render+normalize chain? `runMain graft.tools.Scratch codedup`. */
  private def codeDupMain(sfDir: String): Unit = {
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
    def stage(label: String)(df: DataFrame): Unit = {
      df.count()
      time(label)(println(s"  rows=${df.count()}"))
    }
    stage("gramTable")(graft.operators.CodeCuration.codeGramTable(docs))
    stage("pairs")(graft.operators.Dedup.codeNearDup(
      graft.operators.CodeCuration.codeGramTable(docs)))
    stage("meta")(graft.operators.CodeCuration.codeMeta(docs))
    spark.stop()
  }

  /** r14 probe leg for the DOUBLE store migration (VERDICT r13 #5):
    * chain two banding/width migrations at the 10× probe and verify
    * byte-equality against the from-scratch result at the FINAL
    * arm/width, timing both sides. `runMain graft.tools.Scratch
    * chain [sfDir]`. */
  private def chainMain(sfDir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val D = graft.operators.Dedup
    val S = graft.operators.Similarity
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nSig = D.minhashSignatures(docs).count()
    val r0 = D.autoBandRows(nSig)
    val rFinal = math.min(4 * r0, graft.functions.PortableHash.MinhashK)
    println(s"[chain] text: n=$nSig r0=$r0 chain to $rFinal")
    val chainT = time("text chain r0→4r0")(
      D.minhashRebandChain(docs, steps = 2).collect().toSeq)
    val freshT = time("text from-scratch at 4r0")(
      D.minhashLsh(docs,
        bands = graft.functions.PortableHash.MinhashK / rFinal,
        rowsPerBand = rFinal).collect().toSeq)
    println(s"[chain] text equal=${chainT == freshT} rows=${chainT.size}")
    val w0 = S.autoBits(embs.count())
    println(s"[chain] vec: w0=$w0 chain to ${w0 + 2}")
    val chainV = time("vec chain w0→w0+2")(
      S.knnGraphRebandChain(embs, steps = 2).collect().toSeq)
    val freshV = time("vec from-scratch at w0+2")(
      S.knnGraphAnchored(embs, 4, 4, w0 + 2).collect().toSeq)
    println(s"[chain] vec equal=${chainV == freshV} rows=${chainV.size}")
    spark.stop()
    if (chainT != freshT || chainV != freshV) sys.exit(1)
  }

  /** r14 measurement for the shared-ladder claim (VERDICT r13 #4):
    * recallLadderPostDedup's r13 restructure shares the content-only
    * rungs on the argument that shared scoring scales as nQueries × N
    * while the unshareable parts do not — measured only at
    * nQueries = 8 (wall parity). This times the SHARED form against
    * the two-independent-ladders definition at nQueries ∈ {8, 64,
    * 256}; the crossover goes into BASELINE.md. `runMain
    * graft.tools.Scratch ladder [sfDir]`. */
  private def ladderMain(sfDir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.operators.Similarity
    val D = graft.operators.Dedup
    // NOT checkpointed: clean() unpersists every block between runs,
    // which would kill a shared checkpoint the next run still reads
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def clean(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    def independent(nq: Int): Unit = {
      val losers = D.embeddingNearDup(e)
        .select(col("vec_b").as("vec_id")).distinct()
      val surv = e.join(losers, Seq("vec_id"), "left_anti")
      S.recallLadder(e, nq).union(S.recallLadder(surv, nq)).collect()
      ()
    }
    for (nq <- Seq(8, 64, 256)) {
      // interleaved best-of-2 per shape (shared-host discipline)
      var bestS = Double.MaxValue; var bestI = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        S.recallLadderPostDedup(e, nq).collect()
        bestS = math.min(bestS, (System.nanoTime() - t0) / 1e9)
        clean()
        val t1 = System.nanoTime()
        independent(nq)
        bestI = math.min(bestI, (System.nanoTime() - t1) / 1e9)
        clean()
      }
      println(f"[ladder] nq=$nq%3d shared=$bestS%.2fs independent=$bestI%.2fs")
    }
    spark.stop()
  }

  /** r17 probe (VERDICT r16 #4): decompose the ~0.2–0.4 s/task fixed
    * stage cost that capped what parallelism buys at sf0.1. A FIXED
    * total workload (1M pre-checkpointed rows) is split across
    * n ∈ {1,2,4,8,16,32} tasks in three shapes — plain hash-agg, one
    * broadcast join, two broadcast joins (the rel_triangles shape) —
    * and a per-STAGE listener prints task count, summed
    * executorRunTime, and summed deserialize time for every stage.
    * If total CPU grows ~linearly with n at constant work, the
    * per-task fixed cost is real; the variant that amplifies it
    * names the mechanism. `runMain graft.tools.Scratch taskcost`. */
  private def taskCostMain(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import scala.collection.mutable
    final class S { var n = 0; var run = 0L; var deser = 0L }
    val stages = mutable.LinkedHashMap[Int, S]()
    @volatile var on = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (on) stages.synchronized {
            val s = stages.getOrElseUpdate(t.stageId, new S)
            Option(t.taskMetrics).foreach { m =>
              s.n += 1; s.run += m.executorRunTime
              s.deser += m.executorDeserializeTime
            }
          }
      })
    val base = spark.range(1L << 20)
      .select(col("id"), (col("id") % 1499).as("k")).localCheckpoint(true)
    val small = spark.range(1499)
      .select(col("id").as("k"), (col("id") * 7).as("v"))
      .localCheckpoint(true)
    val small2 = spark.range(1499)
      .select(col("id").as("k2"), (col("id") * 13).as("w"))
      .localCheckpoint(true)
    def run(label: String)(f: => Unit): Unit = {
      f // warmup
      stages.synchronized(stages.clear()); on = true
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200); on = false
      println(f"[taskcost] $label wall=$wall%.3fs")
      stages.synchronized(stages.toSeq.sortBy(_._1)).foreach {
        case (id, s) => println(f"    stage $id%4d n=${s.n}%3d " +
          f"cpu=${s.run / 1e3}%7.3fs deser=${s.deser / 1e3}%6.3fs " +
          f"cpu/task=${s.run / 1e3 / math.max(1, s.n)}%6.4fs")
      }
    }
    for (n <- Seq(1, 2, 4, 8, 16, 32)) {
      run(s"plain  n=$n") {
        base.repartition(n)
          .agg(sum(col("id") * 3 + col("k"))).collect(); ()
      }
      run(s"bjoin1 n=$n") {
        base.repartition(n).join(broadcast(small), "k")
          .agg(sum(col("v") + col("id"))).collect(); ()
      }
      run(s"bjoin2 n=$n") {
        base.repartition(n).join(broadcast(small), "k")
          .join(broadcast(small2), col("k") === col("k2"))
          .agg(sum(col("v") + col("w"))).collect(); ()
      }
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("taskcost")) {
      taskCostMain()
      return
    }
    if (args.headOption.contains("ladder")) {
      ladderMain(args.lift(1).getOrElse("/root/testdata/sf0.1"))
      return
    }
    if (args.headOption.contains("chain")) {
      chainMain(args.lift(1).getOrElse("target/probe/sf1full"))
      return
    }
    if (args.headOption.contains("codedup")) {
      codeDupMain(args.lift(1).getOrElse("/root/testdata/sf0.1"))
      return
    }
    if (args.headOption.contains("editdup")) {
      editDupMain(args.lift(1).getOrElse("/root/testdata/sf0.1"))
      return
    }
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
