package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-job decomposition of one declared query (r16 optimization
  * round; dev tool, not product surface). The sandbox runs with
  * `spark.ui.enabled=false`, so this listener is the stage/job view
  * the optimization guide's §1/§7 methodology reads off the UI:
  * which ACTION (collect / localCheckpoint / fit / final hash) owns
  * the wall, how much is task time vs scheduling gap, and how many
  * bytes each job shuffles.
  *
  * `runMain graft.tools.JobProfile <query>[,<query>…] [sfDir] [reps]`
  * — one untimed warmup (codegen/JIT), then `reps` profiled runs;
  * per job: wall, summed task time, task count, shuffle read/write
  * bytes, and the call site that submitted it. */
object JobProfile {

  private final class Rec {
    var start = 0L
    var end = 0L
    var site = ""
    var nTasks = 0
    var taskNanos = 0L
    var deserMs = 0L
    var gcMs = 0L
    var resSerMs = 0L
    var shufR = 0L
    var shufW = 0L
    var input = 0L
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.LinkedHashMap[Int, Rec]()
    val stageToJob = mutable.HashMap[Int, Int]()
    // written by the main thread, read from the listener-bus thread —
    // volatile so rep-boundary flips are visible (r16 ADVICE)
    @volatile var collecting = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (collecting) synchronized {
          val r = new Rec
          r.start = j.time
          r.site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("")
          jobs(j.jobId) = r
          j.stageIds.foreach(s => stageToJob(s) = j.jobId)
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        if (collecting) synchronized {
          jobs.get(j.jobId).foreach(_.end = j.time)
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (collecting) synchronized {
          for {
            jid <- stageToJob.get(t.stageId)
            r <- jobs.get(jid)
            m <- Option(t.taskMetrics)
          } {
            r.nTasks += 1
            r.taskNanos += m.executorRunTime * 1000000L
            // r17 (VERDICT #4): split the fixed per-task cost —
            // executorRunTime EXCLUDES these three
            r.deserMs += m.executorDeserializeTime
            r.gcMs += m.jvmGCTime
            r.resSerMs += m.resultSerializationTime
            r.shufR += m.shuffleReadMetrics.totalBytesRead
            r.shufW += m.shuffleWriteMetrics.bytesWritten
            r.input += m.inputMetrics.bytesRead
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Unit = {
        import org.apache.spark.sql.functions._
        val df = fn(spark, sfDir)
        val h = xxhash64(df.columns.map(col): _*)
        df.select(h.as("h")).agg(expr("bit_xor(h)")).collect()
        ()
      }
      def clean(): Unit = spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      once(); clean() // warmup
      for (rep <- 1 to reps) {
        jobs.clear(); stageToJob.clear()
        collecting = true
        val t0 = System.nanoTime()
        once()
        val wall = (System.nanoTime() - t0) / 1e9
        // drain listener-bus stragglers before reading the maps
        // (listenerBus is private[spark]; a short sleep suffices for
        // a dev tool — job-end events land within milliseconds)
        Thread.sleep(300)
        collecting = false
        println(f"%n[jobprofile] $name rep $rep wall=$wall%.2fs " +
          s"jobs=${jobs.size}")
        val rows = jobs.toSeq.sortBy(_._1)
        var acct = 0.0
        rows.foreach { case (id, r) =>
          val w = (r.end - r.start) / 1e3
          acct += w
          println(f"  job $id%3d ${w}%7.3fs task=${r.taskNanos / 1e9}%7.2fs " +
            f"deser=${r.deserMs / 1e3}%6.2fs gc=${r.gcMs / 1e3}%5.2fs " +
            f"rser=${r.resSerMs / 1e3}%5.2fs " +
            f"n=${r.nTasks}%4d shufR=${r.shufR / 1024}%8dK " +
            f"shufW=${r.shufW / 1024}%8dK in=${r.input / 1024}%8dK  ${r.site}")
        }
        println(f"  [sum of job walls] $acct%.2fs (gaps = driver/plan time)")
        clean()
      }
    }
    spark.stop()
  }
}
