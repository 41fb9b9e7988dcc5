package graft.functions

import org.apache.spark.sql.DataFrame

/** Partitioning hygiene for CPU-bound stages.
  *
  * The bench corpus is single-row-group parquet, which Spark cannot
  * split — every scan arrives as ONE partition and any expression-
  * heavy stage right after it (shingling, hashing, decoding) runs
  * single-threaded no matter how many cores the session has.
  * `spread` round-robins such inputs up to the session parallelism.
  * On a production lake with many files/row-groups the input already
  * has ≥ parallelism/2 splits and this is a no-op — the check keeps
  * the extra shuffle out of plans that don't need it.
  */
object Partitioning {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val threshold = math.max(2, target / 2)
    // inputFiles (metadata-only) rather than df.rdd.getNumPartitions
    // for file-backed frames: inspecting the RDD forces physical
    // planning outside AQE. File count lower-bounds scan splits
    // (large files add row-group splits on top, so many-file inputs
    // are never repartitioned here).
    val files = df.inputFiles.length
    if (files == 0)
      // non-file-backed input (in-memory test frame, localCheckpoint'd
      // or mapPartitions-derived): file count says nothing, so fall
      // back to the RDD partition count — these frames are already
      // materialized (or tiny), so forcing planning here is harmless,
      // and an already-well-partitioned derived frame must NOT eat an
      // unconditional shuffle
      if (df.rdd.getNumPartitions < threshold) df.repartition(target) else df
    else if (files < threshold) df.repartition(target)
    else df
  }
}
