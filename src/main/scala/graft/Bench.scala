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

  /** Drop storage blocks left behind by the query that just ran
    * (r8): operators that localCheckpoint (the shared-shingle /
    * iterative families) leave their blocks alive until the driver
    * GCs the plan references, so a long suite accumulates ~GBs of
    * dead storage and later checkpoints run against a full
    * BlockManager (measured in tools/Scratch: dd_lsh_verified 1.0 s
    * clean vs 2.4 s under 14 GB of live ballast — the r7 1.5→2.5 s
    * "regression" was this harness artifact, not engine cost). Each
    * production query is its own cluster job with its own executors,
    * so per-query cleanup is the faithful cost model, not a cheat.
    * Safe mid-suite: every timed sample rebuilds its plan from
    * scratch, so no later run reads an unpersisted block. Blocking
    * (r9, ADVICE r8): the call sits OUTSIDE the timed region, and an
    * async eviction could overlap the start of the next timed sample
    * — pay the wait here so the measurement starts clean. Invariant
    * this enforces on query registration: no query may intentionally
    * cache across bench samples (each sample must rebuild from
    * scratch); a family that needs cross-run state belongs in its
    * own harness, not SparkEntry.queries. */
  private def dropLeftoverBlocks(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

  /** Fixed-work calibration probe: hash-reduce a constant in-memory
    * range. Pure CPU, no IO, no shuffle — its wall time moves ONLY
    * with host conditions (shared-host CPU contention / frequency),
    * never with query or data changes, so start/end/ratio printed on
    * stderr let a reviewer adjudicate whether a slow total is the
    * engine or the box (observed: same commit, same data, 50 s vs
    * 105 s totals purely from host noise). */
  private def calibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 64000000L, 1L, 32)
      .select(xxhash64(col("id")).as("h"))
      .agg(expr("bit_xor(h)")).collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** 1-minute /proc/loadavg, read around every timed sample (r16,
    * VERDICT r15 #3 — make host-regime adjudication machine-checkable
    * instead of narrative): with the calibration pair this puts the
    * load CONTEXT of each per-query minimum into the committed record,
    * so "uniform host shift vs real regression" is decided from the
    * record, not from prose. -1 when unreadable (non-Linux). */
  private def loadavg(): Double =
    try java.nio.file.Files
      .readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split(' ').head.toDouble
    catch { case _: Throwable => -1.0 }

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
    // Probe-leg cost control (r12, VERDICT r11 #7): the 10× probe
    // bench is ~35 min and growing, most of it eval harnesses that
    // re-run every rung BY DESIGN. SPARK_GRAFT_BENCH_TIER=prod
    // restricts a run to the production tier for per-iteration probe
    // legs; the driver and the committed closing record run with the
    // variable unset — the full surface, contract unchanged.
    val tier = sys.env.getOrElse("SPARK_GRAFT_BENCH_TIER", "all")
    // Only the two declared tiers are accepted: a typo ("Prod",
    // "eval") would otherwise silently run the FULL surface yet
    // record under a stray suffixed file invisible to the regression
    // baseline — slow AND unrecorded. Fail loudly instead.
    require(tier == "all" || tier == "prod",
      s"SPARK_GRAFT_BENCH_TIER must be 'all' or 'prod', got '$tier'")
    val names = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      tier != "prod" || !SparkEntry.evalQueries.contains(n) }
    val calStart = calibrate(spark)
    // One untimed warmup pass over the whole suite (janino codegen
    // compile, JIT, broadcast thread-pool spin-up — one-time costs a
    // long-lived cluster job amortizes), then R timed ROUND-ROBIN
    // passes: pass 1 times every query, then pass 2, then pass 3, so
    // the three samples of any query are separated by a full suite
    // (~minutes). min-of-3 is the steady-state estimator; spreading
    // the samples means a sustained host-load window (observed on
    // this shared box: 2-60x spikes lasting minutes) dents one sample
    // of many queries instead of all samples of a few — consecutive
    // min-of-3 cannot dodge noise that outlasts the 3 runs. Nothing
    // is cached between runs: each run re-executes the full plan
    // including any fit/collect the operator performs.
    names.foreach { case (name, fn) =>
      try materialize(fn(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name warmup failed: $e")
      }
      dropLeftoverBlocks(spark)
    }
    // per sample: (wall s, loadavg before, loadavg after) — the load
    // pair travels with its sample so the committed record can show
    // the min-wall sample's host context (r16, VERDICT r15 #3)
    val samples =
      collection.mutable.Map[String, List[(Double, Double, Double)]]()
        .withDefaultValue(Nil)
    for (_ <- 1 to 3) {
      names.foreach { case (name, fn) =>
        val l0 = loadavg()
        val t0 = System.nanoTime()
        try materialize(fn(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e")
        }
        val wall = (System.nanoTime() - t0) / 1e9
        samples(name) = (wall, l0, loadavg()) :: samples(name)
        // untimed: block cleanup is harness bookkeeping, not query work
        dropLeftoverBlocks(spark)
      }
    }
    val calEnd = calibrate(spark)
    val results = names.map { case (name, _) =>
      name -> samples(name).map(_._1).min }
    // the min-wall sample's (load before, load after) per query
    val minLoads: Map[String, (Double, Double)] = names.map { case (name, _) =>
      val best = samples(name).minBy(_._1)
      name -> (best._2, best._3)
    }.toMap
    // Diagnostics on stderr: all three samples per query + the
    // calibration pair (stdout stays exactly the one-line contract).
    System.err.println("[bench-cal] " +
      f"start=$calStart%.2fs end=$calEnd%.2fs " +
      f"ratio=${calEnd / calStart}%.2f")
    results.foreach { case (name, _) =>
      System.err.println(s"[bench-runs] $name " +
        samples(name).reverse
          .map { case (t, l0, l1) => f"$t%.2f@$l0%.1f-$l1%.1f" }
          .mkString(","))
    }
    // Per-query regression gate (r8, VERDICT r7 #3): diff against the
    // PREVIOUS committed full record before overwriting it, and name
    // every query moving >1.5x AND >0.3s — the dd_lsh_verified class
    // of regression must not hide inside a green total.
    reportRegressions(readPrevQueries(sfDir), results)
    // Full-fidelity record: the stdout ladder may fold the fastest
    // queries into "_rest" to fit the driver's 2 kB tail window, so
    // persist the complete 3-decimal per-query map to a file the
    // judge/BASELINE can read (overwritten per run, keyed by SF).
    // A tier-restricted run records under a tier suffix — it must
    // never clobber the full record the regression gate diffs against
    // (the diff above still works: it only inspects queries present
    // in the current run).
    writeFullRecord(results, sfDir,
      if (tier == "all") "" else s"_$tier",
      (calStart, calEnd), minLoads)
    println(formatLine(results, sfDir))
    spark.stop()
  }

  /** Parse the `"queries":{...}` map out of a bench_full record.
    * Self-authored fixed format (writeFullRecord), so a regex parse
    * is exact — no JSON library needed on the product classpath. */
  private[graft] def parseQueriesMap(json: String): Map[String, Double] = {
    val body = json.indexOf("\"queries\":{") match {
      case -1 => return Map.empty
      case i =>
        val start = i + "\"queries\":{".length
        // a record truncated before the closing '}' (partial write /
        // clipped tail) must parse as empty, not throw (r9, ADVICE r8)
        json.indexOf('}', start) match {
          case -1 => return Map.empty
          case end => json.substring(start, end)
        }
    }
    val entry = "\"([^\"]+)\":([0-9.]+)".r
    entry.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  private def readPrevQueries(sfDir: String): Map[String, Double] = {
    val p = java.nio.file.Paths.get(
      s"bench_full_${sfDir.split('/').last}.json")
    if (!java.nio.file.Files.exists(p)) Map.empty
    else try parseQueriesMap(java.nio.file.Files.readString(p))
    catch { case _: Throwable => Map.empty }
  }

  /** Queries that regressed vs the previous record: >1.5x slower AND
    * >0.3s absolute (both thresholds — a 2x move on a 50ms query is
    * noise; a +0.4s move on a 10s query is <1.5x drift). Returns
    * (name, prev, cur) sorted by absolute regression, worst first. */
  private[graft] def regressionDiff(prev: Map[String, Double],
      cur: Seq[(String, Double)]): Seq[(String, Double, Double)] =
    cur.flatMap { case (name, t) =>
      prev.get(name) match {
        case Some(p) if t > p * 1.5 && t - p > 0.3 => Some((name, p, t))
        case _ => None
      }
    }.sortBy { case (_, p, t) => p - t }

  private def reportRegressions(prev: Map[String, Double],
      cur: Seq[(String, Double)]): Unit = {
    if (prev.isEmpty) {
      System.err.println("[bench-regress] no previous record")
      return
    }
    val regs = regressionDiff(prev, cur)
    if (regs.isEmpty) System.err.println(
      "[bench-regress] none (thresholds: >1.5x and >0.3s)")
    else regs.foreach { case (name, p, t) =>
      System.err.println(f"[bench-regress] $name prev=$p%.2fs " +
        f"cur=$t%.2fs ratio=${t / p}%.2f")
    }
  }

  private def writeFullRecord(results: Seq[(String, Double)],
      sfDir: String, suffix: String = "",
      cal: (Double, Double) = (-1.0, -1.0),
      minLoads: Map[String, (Double, Double)] = Map.empty): Unit = {
    val sf = sfDir.split('/').last + suffix
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def f2(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // host-context fields (r16, VERDICT r15 #3): the fixed-work
    // calibration pair and each query's min-wall-sample loadavg pair,
    // AFTER "queries" so parseQueriesMap's substring parse is
    // untouched. These make regime adjudication mechanical: a uniform
    // carried-ratio shift with cal ratio ≈ the shift and loads ≫ 32
    // is the box; a single query moving on idle loads is the engine.
    val loads = minLoads.toSeq.sortBy(_._1).map { case (k, (l0, l1)) =>
      "\"" + k + "\":[" + f2(l0) + "," + f2(l1) + "]"
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
        s""""tiers":${tiersJson(results, f3)},"queries":$qs,""" +
        s""""cal":{"start":${f2(cal._1)},"end":${f2(cal._2)}},""" +
        s""""qload":$loads,"sf":"$sf"}"""
    try {
      val p = java.nio.file.Paths.get(s"bench_full_$sf.json")
      java.nio.file.Files.write(p,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] full record -> $p")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] full-record write failed: $e")
    }
  }

  /** Production/eval tier second sums as a JSON object — the split
    * SparkEntry.evalQueries defines, rendered with the caller's
    * number format (3-decimal for the full record, 1-decimal for the
    * byte-budgeted stdout line). */
  private def tiersJson(results: Seq[(String, Double)],
      fmt: Double => String): String = {
    val (ev, prod) = results.partition(r =>
      SparkEntry.evalQueries.contains(r._1))
    s"""{"prod":${fmt(prod.map(_._2).sum)},"eval":${fmt(ev.map(_._2).sum)}}"""
  }

  /** The one-line stdout contract, factored out so a spec can pin the
    * size bound. The harness that records this line keeps only a 2 kB
    * output tail, and the JSON must survive it WHOLE — round 3 lost a
    * bench to head-truncation (line present but unparseable) when
    * full-precision doubles overflowed the window. Degradation ladder,
    * chosen by RENDERED length (a query-count threshold lies once
    * names grow): 2-decimal per-query values (77 queries ≈ 1.75 kB)
    * → 1-decimal → slowest-queries-only with a "_rest" entry summing
    * the dropped tail (slow queries are what baseline comparison and
    * regression adjudication read; the dropped fast tail stays
    * accounted for in "_rest" and the exact total). */
  private[graft] def formatLine(results: Seq[(String, Double)],
      sfDir: String): String = {
    // The driver keeps the LAST 2,000 bytes of output; sbt appends a
    // trailing "[success] Total time: …" line (observed 74 bytes incl.
    // newline) AFTER our line, so the real head-safe budget is ≈1,926.
    // Round 5 lost the official record to this: a 1,954-byte line fit
    // the old 1,960 budget but the trailer pushed its head out of the
    // window ("parsed": null). 1,900 leaves 26 bytes of slack against
    // trailer drift.
    val budget = 1900
    def fmt(v: Double, d: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${d}f", Double.box(v))
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // the constant /root/testdata/ prefix is 15 dead bytes in a
    // budget measured to the byte — record the SF basename
    val sf = sfDir.split('/').last
    // tier split (r11, VERDICT r10 #8): production vs eval-harness
    // second sums, so the window reader sees production cost even
    // when the ladder folds fast queries into "_rest". Computed over
    // the FULL result set, before any folding.
    val tiers = tiersJson(results, fmt(_, 1))
    def render(rs: Seq[(String, Double)], d: Int): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + fmt(v, d) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec",""" +
        s""""tiers":$tiers,"queries":$qs,"sf":"$sf"}"""
    }
    val full2 = render(results, 2)
    if (full2.length <= budget) return full2
    val full1 = render(results, 1)
    if (full1.length <= budget) return full1
    // keep the slowest queries that fit; fold the rest into "_rest"
    val bySlowest = results.sortBy(-_._2)
    var keep = bySlowest.size
    var line = full1
    while (keep > 0 && line.length > budget) {
      keep -= 1
      val kept = bySlowest.take(keep)
      val rest = bySlowest.drop(keep).map(_._2).sum
      line = render(kept :+ ("_rest" -> rest), 1)
    }
    line
  }
}
