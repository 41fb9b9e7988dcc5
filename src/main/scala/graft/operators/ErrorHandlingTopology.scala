package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-topology assembly: Kafka-shaped records in, four sink-ready
  * DataFrames out (reference dataflow, SURVEY.md §2.1):
  *
  * {{{
  * input ── safeDecode ──┬─ deser failure ───────────────→ deserializationDlt
  *                       └─ wrapMap ── split ─┬─ error ──→ processDlt
  *                                            └─ ok ── sizeGuard ─┬─ fits → output
  *                                                                └─ big  → productionDlt
  * }}}
  *
  * The four results share one lineage prefix; callers that materialize
  * more than one should persist the source batch first (see
  * `graft.streaming.StreamingTopology`) so the scan runs once.
  */
object ErrorHandlingTopology {

  /** The four sink-ready record sets of one pass over the input. */
  final case class Branches(
      output: DataFrame,
      processDlt: DataFrame,
      deserializationDlt: DataFrame,
      productionDlt: DataFrame)

  /** Full pipeline over a batch (or foreachBatch micro-batch) of
    * Kafka-shaped records `(key binary, value binary[, headers])`. */
  def apply(records: DataFrame,
            maxRequestSize: Int = ErrorChannel.DefaultMaxRequestSize): Branches = {
    val decoded = ErrorChannel.safeDecode(records)
    val deserDlt = ErrorChannel.deserFailures(decoded)
    val mapped = ErrorChannel.wrapMap(ErrorChannel.decodeOk(decoded))
    val processDlt = ErrorChannel.toProcessDlt(ErrorChannel.errorBranch(mapped))
    val outAll = ErrorChannel.toOutput(ErrorChannel.okBranch(mapped))
    val output = ErrorChannel.sizeOk(outAll, maxRequestSize)
    val productionDlt = ErrorChannel.toProductionDlt(outAll, maxRequestSize)
    Branches(output, processDlt, deserDlt, productionDlt)
  }

  /** One-pass branch bookkeeping: label every record with the branch
    * [[apply]] would route it to, using the SAME stage predicates, but
    * as a single narrow map stage — branch statistics over 100 TB are
    * then one scan + a |branches|-row aggregate instead of four scans
    * over the same lineage prefix. (The multi-SINK fan-out keeps using
    * [[apply]] behind a persist — StreamingTopology.processBatch; this
    * is the monitoring/accounting path.) Split totality — every record
    * gets exactly one label — is asserted in ErrorHandlingTopologySpec. */
  def branchTag(records: DataFrame,
                maxRequestSize: Int = ErrorChannel.DefaultMaxRequestSize): DataFrame = {
    val mapped = ErrorChannel.wrapMap(ErrorChannel.safeDecode(records))
    // Size guard applies to the OUTPUT-shaped record (value = mapped
    // string as UTF-8 bytes) — same expression as toOutput + recordSize.
    val outSize =
      coalesce(octet_length(col("wrapper.mappedValue").cast("binary")), lit(0)) +
        coalesce(octet_length(col("key")), lit(0)) +
        lit(ErrorChannel.RecordOverheadBytes)
    mapped.withColumn("branch",
      when(col("value").isNotNull && col("value_int").isNull,
        "deserialization-exception.DLT")
        .when(ErrorChannel.hasError, "process-exception.DLT")
        .when(outSize > maxRequestSize, "production-exception.DLT")
        .otherwise("output"))
  }
}
