package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, xxhash64}

/** Driver-run benchmark: wall time per declared query at the given SF.
  * Prints ONE JSON line on stdout (build.sbt routes forked output
  * straight through so the line is not sbt-log-prefixed).
  */
object Bench {

  /** Materialize the FULL result, not count(): hash every column of
    * every row and reduce. count() lets Catalyst prune unreferenced
    * projection expressions (and the trailing ORDER BY) — here every
    * projected expression feeds the hash, so the measured work is the
    * query's work. (The total-order sort itself is still eliminable
    * under the agg, which matches the operator contract: the ORDER BY
    * exists only for the oracle's row-hash compare, not the operator.)
    */
  private def materialize(df: DataFrame): Unit = {
    // bit_xor, not sum: summing 64-bit hashes overflows under ANSI.
    val h = xxhash64(df.columns.map(col): _*)
    df.select(h.as("h")).agg(expr("bit_xor(h)")).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session warmup (filesystem/scheduler/BlockManager init).
    try spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().collect()
    catch { case _: Throwable => () }
    // Per query: one untimed warmup (janino codegen compile, JIT,
    // broadcast thread-pool spin-up — one-time costs a long-lived
    // cluster job amortizes) + min of 3 timed runs. min-of-N is the
    // steady-state estimator and filters shared-host load spikes
    // (observed up to 2x on this box); nothing is cached between runs
    // — each run re-executes the full plan including any fit/collect
    // the operator performs.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try materialize(fn(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name warmup failed: $e")
      }
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try materialize(fn(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
