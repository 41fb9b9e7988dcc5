package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query wall-clock probe (dev tool, not product surface):
  * `runMain graft.tools.TimeQuery <sfDir> <name>[,<name>…] [reps]` —
  * one JVM, one untimed warmup per query, then best-of-reps, the
  * Bench estimator without the 243-query suite around it. For A/B
  * timing one operator while iterating on its plan. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // A/B config experiments (dev tool): semicolon-separated k=v list
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).queryExecution // force resolution errors early
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite")
          .format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup (codegen compile, JIT)
      val times = (1 to reps).map(_ => once())
      println(f"[timequery] $name best=${times.min}%.2fs " +
        s"all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
