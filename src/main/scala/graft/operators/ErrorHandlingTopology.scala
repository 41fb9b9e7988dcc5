package graft.operators

import org.apache.spark.sql.DataFrame

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
}
