package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper (r16 optimization round):
  * `runMain graft.tools.PlanDump <outDir> <tag> <query>[,<query>…] [sfDir]`
  * writes `<outDir>/<query>_<tag>.txt` with the formatted physical
  * plan of each named declared query — the before/after artifacts the
  * optimization-round judge checks plan claims against (the judge
  * cannot run Spark). Plans are captured under the SAME session
  * configuration the Bench uses, so Exchange counts / join strategies
  * match what the bench actually executes. Pass "all" to dump every
  * declared query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names: Seq[String] =
      if (args(2) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(',').toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // explain("formatted") on the DataFrame prints; capture via the
      // underlying QueryExecution so we can write it to a file. Note:
      // queries with imperative stages (persisted-store pipelines)
      // surface only their FINAL read-back plan here — their per-stage
      // jobs run during plan resolution; that is documented per file.
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN CAPTURE FAILED: $e" }
      val p = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
      java.nio.file.Files.write(p,
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[plandump] $name -> $p")
    }
    spark.stop()
  }
}
