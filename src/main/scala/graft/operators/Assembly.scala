package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash => PH, TextOps}

/** Training-run assembly: the last mile of a data pipeline, after
  * curation — render supervised examples out of structured records,
  * decide how much of each domain the run consumes, and lay the
  * corpus out into balanced output shards. All three are exact,
  * integer-arithmetic plans (div, not double division — the ppm
  * boundaries must hash-match the DuckDB oracle bit for bit).
  */
object Assembly {

  /** SFT example rendering: join the fact table to its dimension and
    * render deterministic (prompt, completion) pairs with loss-span
    * token accounting — prompt tokens are masked out of the loss, so
    * the pipeline must carry `loss_start` (first completion token,
    * 0-based) alongside the text, and a context-length admit flag.
    *
    * Shape: one broadcast dimension join (customer is a dimension;
    * at warehouse scale where it outgrows the broadcast threshold
    * this becomes a shuffle-hash join on o_custkey — the render
    * itself is a row-local projection either way). Dates are
    * rendered as epoch DAYS and money as floor-dollars: integer
    * forms both engines produce byte-identically (the strftime /
    * double-rounding dialect traps have no integer analogue). */
  def sftRender(orders: DataFrame, customer: DataFrame,
                ctxTokens: Int = 18): DataFrame = {
    val day = expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
    val prompt = concat(
      lit("Instruction: summarize order "), col("o_orderkey").cast("string"),
      lit(" placed by "), col("c_name"),
      lit(" on day "), day.cast("string"), lit("."))
    val completion = concat(
      lit("Response: status "), col("o_orderstatus"),
      lit(", priority "), col("o_orderpriority"),
      lit(", total "), floor(col("o_totalprice")).cast("long").cast("string"),
      lit(" dollars."))
    orders
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").as("example_id"),
        prompt.as("prompt"), completion.as("completion"))
      .withColumn("prompt_tokens",
        size(TextOps.words(col("prompt"))).cast("long"))
      .withColumn("completion_tokens",
        size(TextOps.words(col("completion"))).cast("long"))
      .withColumn("total_tokens",
        (col("prompt_tokens") + col("completion_tokens")).cast("long"))
      .withColumn("loss_start", col("prompt_tokens"))
      .withColumn("ctx_ok", (col("total_tokens") <= ctxTokens).cast("long"))
      .orderBy("example_id")
  }

  /** Mixture plan: given per-(lang, source) token inventories and a
    * token budget for the run, emit the sampling plan — target weight
    * (sqrt-damped, the standard "flatten the head without drowning
    * the tail" temperature), tokens requested from each domain, and
    * the implied epoch count (oversampled domains repeat; the flag is
    * what a run review reads first). The aggregate is k-rows tiny
    * (domains, not documents), so the global-window total costs
    * nothing; all shares are integer div — exact on both engines.
    * Weight uses floor(sqrt(tokens)): ONE correctly-rounded IEEE op
    * per group, never a cross-group double sum (summation order
    * differs between engines). */
  def mixPlan(docs: DataFrame, budgetTokens: Long = 10000000L): DataFrame = {
    val tok = size(TextOps.words(col("text"))).cast("long")
    val inv = docs.select(col("lang"), col("source"), tok.as("t"))
      .groupBy("lang", "source").agg(sum("t").as("tokens"))
      .withColumn("weight", floor(sqrt(col("tokens").cast("double"))).cast("long"))
      .withColumn("w_sum", sum("weight").over(Window.partitionBy()))
    inv.select(col("lang"), col("source"), col("tokens"), col("weight"),
        expr("1000000 * weight div w_sum").as("target_ppm"))
      .withColumn("requested_tokens",
        expr(s"target_ppm * $budgetTokens div 1000000"))
      .withColumn("epochs_x100",
        expr("(100 * requested_tokens + tokens - 1) div tokens"))
      .withColumn("oversampled", (col("epochs_x100") > 100).cast("long"))
      .orderBy("lang", "source")
  }

  /** DPO/RLHF preference-pair rendering — the assembly step that
    * turns ranked records into (prompt, chosen, rejected) triples.
    * Preference signal: within each customer, the most urgent order
    * (priority string asc — '1-URGENT' sorts first — then orderkey,
    * a deterministic total order) is `chosen`, the runner-up is
    * `rejected`; customers with fewer than two orders produce no
    * pair. `margin_dollars` (chosen − rejected floor-dollar totals,
    * may be negative) is the reward-margin column margin-weighted
    * DPO variants consume. Shape: ONE shuffle on the partition key
    * serving both the row_number window and the pair-collapse
    * group-by (same key, exchange reused), then a broadcast
    * dimension join and row-local rendering — the [[sftRender]]
    * integer-forms discipline (floor dollars, no dates here) so both
    * engines render byte-identically. */
  def dpoRender(orders: DataFrame, customer: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderpriority").asc, col("o_orderkey").asc)
    def completion(p: String) = concat(
      lit("Response: order "), col(p + "_okey").cast("string"),
      lit(" priority "), col(p + "_prio"),
      lit(", total "), col(p + "_total").cast("string"),
      lit(" dollars."))
    val ranked = orders
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_orderpriority"),
        floor(col("o_totalprice")).cast("long").as("tot"))
    val pairs = ranked.groupBy("o_custkey").agg(
        count(lit(1)).as("n"),
        max(when(col("rn") === 1, col("o_orderkey"))).as("ch_okey"),
        max(when(col("rn") === 1, col("o_orderpriority"))).as("ch_prio"),
        max(when(col("rn") === 1, col("tot"))).as("ch_total"),
        max(when(col("rn") === 2, col("o_orderkey"))).as("rj_okey"),
        max(when(col("rn") === 2, col("o_orderpriority"))).as("rj_prio"),
        max(when(col("rn") === 2, col("tot"))).as("rj_total"))
      .where(col("n") === 2)
    pairs.join(broadcast(customer.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey").as("pair_id"),
        concat(lit("Instruction: pick the most urgent order for "),
          col("c_name"), lit(".")).as("prompt"),
        completion("ch").as("chosen"),
        completion("rj").as("rejected"),
        (col("ch_total") - col("rj_total")).as("margin_dollars"))
      .withColumn("chosen_tokens",
        size(TextOps.words(col("chosen"))).cast("long"))
      .withColumn("rejected_tokens",
        size(TextOps.words(col("rejected"))).cast("long"))
      .orderBy("pair_id")
  }

  /** Deterministic per-epoch training order: every (epoch, doc) gets
    * a reproducible shard and position — the materialized read order
    * a training run replays EXACTLY on restart, resume, or re-run
    * (the reproducibility contract data loaders build on). Order key
    * = salted portable hash of (epoch, doc_id), so each epoch is an
    * independent uniform shuffle; shard = okey mod nShards (balanced
    * by hash uniformity); position is PER (epoch, shard), which is
    * how training data is actually laid out — readers consume shards
    * sequentially and interleave across them, so no global position
    * (and no single-partition global sort) is ever needed: the
    * window key is (epoch, shard) and sort parallelism GROWS with
    * nShards, the tx_pack → tx_pack_bylang lesson applied at design
    * time rather than retrofitted. */
  def epochOrder(docs: DataFrame, epochs: Int = 2,
                 nShards: Int = 8): DataFrame = {
    val keyed = docs
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .select(col("epoch").cast("long").as("epoch"), col("doc_id"),
        PH.h31(concat(lit("eorder:"), col("epoch").cast("string"),
          lit(":"), col("doc_id").cast("string"))).as("okey"))
      .withColumn("shard_id", (col("okey") % nShards).cast("long"))
    val w = Window.partitionBy("epoch", "shard_id")
      .orderBy(col("okey"), col("doc_id"))
    keyed.withColumn("shard_pos", row_number().over(w).cast("long"))
      .select("epoch", "shard_id", "shard_pos", "doc_id", "okey")
      .orderBy("epoch", "shard_id", "shard_pos")
  }

  /** Curriculum training order (r10): [[epochOrder]]'s deterministic
    * (epoch, shard) layout with the WITHIN-SHARD read order driven by
    * quality instead of the salt — each shard streams easy→hard
    * (quality_ppm desc, the `tx_quality` composite; salt and doc id
    * break ties, so the order stays a pinned total order and replay
    * stays exact). Shard ASSIGNMENT keeps the same epoch-salted hash
    * as [[epochOrder]] — curriculum reorders within readers, it must
    * not unbalance them — and the quality table joins on doc_id once
    * before the explode, so the score is computed once per doc, not
    * once per (epoch, doc). The curriculum-vs-uniform choice then
    * costs NOTHING at read time: both orders are materialized
    * columns of the same layout. */
  def curriculumOrder(docs: DataFrame, epochs: Int = 2,
                      nShards: Int = 8): DataFrame = {
    val q = graft.operators.TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality_ppm"))
    val keyed = q
      .select(col("doc_id"), col("quality_ppm"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .select(col("epoch").cast("long").as("epoch"), col("doc_id"),
        col("quality_ppm"),
        PH.h31(concat(lit("eorder:"), col("epoch").cast("string"),
          lit(":"), col("doc_id").cast("string"))).as("okey"))
      .withColumn("shard_id", (col("okey") % nShards).cast("long"))
    val w = Window.partitionBy("epoch", "shard_id")
      .orderBy(col("quality_ppm").desc, col("okey"), col("doc_id"))
    keyed.withColumn("shard_pos", row_number().over(w).cast("long"))
      .select("epoch", "shard_id", "shard_pos", "doc_id", "quality_ppm")
      .orderBy("epoch", "shard_id", "shard_pos")
  }

  /** Shard layout plan: hash-assign documents to `nShards` output
    * shards and report the balance — the write-sharding step before
    * training files are cut, where skew means one straggling writer
    * and one over-long training file. The salted portable hash is the
    * SAME family every sampler here uses, so shard assignment is
    * reproducible across engines and runs. balance_ppm = this shard's
    * token share × nShards (1e6 = perfectly balanced). The numerator
    * stays far inside int64 at bench scale; at real corpus scale the
    * division happens per-shard against a precomputed total (same
    * plan, no widening). */
  def shardPlan(docs: DataFrame, nShards: Int = 16): DataFrame = {
    val tok = size(TextOps.words(col("text"))).cast("long")
    val shard = PH.h31(concat(lit("shard:"), col("doc_id").cast("string"))) % nShards
    docs.select(shard.as("shard_id"), tok.as("t"),
        length(col("text")).cast("long").as("c"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("t").as("n_tokens"),
        sum("c").as("n_chars"))
      .withColumn("tot", sum("n_tokens").over(Window.partitionBy()))
      .select(col("shard_id"), col("n_docs"), col("n_tokens"), col("n_chars"),
        expr(s"1000000 * n_tokens * $nShards div tot").as("balance_ppm"))
      .orderBy("shard_id")
  }

  /** No-split sequence-packing quality report (r11, VERDICT r10 #4):
    * first-fit-decreasing bin packing of whole documents into
    * `shardTokens`-capacity shards vs the split-stream layout
    * ([[graft.operators.TextAnalysis.tokenPack]]'s accounting, which
    * chops the concatenated token stream and pays padding only in
    * the final shard — the information-theoretic shard-count lower
    * bound ⌈T/C⌉). The measurable claim is the DELTA: what
    * preserving document boundaries costs in shards and padding.
    * One row per method with exact-integer shard/pad/waste counts.
    *
    * Scale shape: FFD is order-free — it depends only on the
    * MULTISET of item sizes — so the corpus never sorts globally;
    * one map-side-combinable histogram aggregate (≤ `shardTokens`
    * distinct item sizes, a model-sized collect like the BPE merge
    * table) feeds a driver simulation that walks bins as
    * (remaining, count) RUNS in bin-index order: placing c items of
    * size s batches to ⌊rem/s⌋ per bin (first-fit walks forward
    * monotonically within a size class — bins before the cursor all
    * have rem < s), so the loop is O(capacity · runs), independent
    * of N. Documents longer than the capacity contribute ⌊n/C⌋
    * zero-pad full shards plus an n mod C remainder item
    * (deterministic, oracle-restated). The oracle replays FFD
    * doc-by-doc with a recursive CTE — an intentionally different
    * formulation of the same algorithm, so the run-batching
    * equivalence is itself under the hash. */
  def packBestFit(docs: DataFrame, shardTokens: Long = 4096L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val c = shardTokens
    val sized = docs
      .select(size(TextOps.words(col("text"))).cast("long").as("n"))
      .where(col("n") > 0)
      .select(col("n"),
        when(col("n") > c, col("n") % c).otherwise(col("n")).as("s"),
        when(col("n") > c, floor(col("n") / c).cast("long"))
          .otherwise(lit(0L)).as("full"))
    // the ONLY collect: (item size → count) plus per-class token and
    // full-shard sums — bounded by the capacity, never by the corpus
    val hist = sized.groupBy("s")
      .agg(count(lit(1)).as("cnt"), sum("n").as("sn"), sum("full").as("sf"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = hist.map(_._2).sum
    val total = hist.map(_._3).sum
    val fullShards = hist.map(_._4).sum
    // FFD over size classes, bins kept as (remaining, nBins) runs in
    // bin-index order; s == 0 rows are oversize docs that split into
    // full shards exactly (no remainder item)
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for ((s, cnt, _, _) <- hist.filter(_._1 > 0).sortBy(-_._1)) {
      var remaining = cnt
      var i = 0
      while (remaining > 0 && i < runs.length) {
        val (rem, nb) = runs(i)
        if (rem >= s) {
          val perBin = rem / s
          if (remaining >= nb * perBin) {
            runs(i) = (rem - perBin * s, nb)
            remaining -= nb * perBin
            i += 1
          } else {
            val fullBins = remaining / perBin
            val partial = remaining - fullBins * perBin
            val repl = Seq(
              (rem - perBin * s, fullBins),
              (rem - partial * s, if (partial > 0) 1L else 0L),
              (rem, nb - fullBins - (if (partial > 0) 1L else 0L)))
              .filter(_._2 > 0)
            runs.remove(i)
            runs.insertAll(i, repl)
            remaining = 0
          }
        } else i += 1
      }
      if (remaining > 0) {
        val perBin = c / s // >= 1: items are <= capacity by split
        val fullNew = remaining / perBin
        val partial = remaining - fullNew * perBin
        if (fullNew > 0) runs += ((c - perBin * s, fullNew))
        if (partial > 0) runs += ((c - partial * s, 1L))
      }
    }
    val nFfd = runs.map(_._2).sum + fullShards
    val padFfd = runs.map(r => r._1 * r._2).sum
    val maxPadFfd = if (runs.isEmpty) 0L else runs.map(_._1).max
    val nStream = (total + c - 1) / c
    val padStream = nStream * c - total
    def waste(pad: Long, n: Long): Long =
      if (n == 0) 0L else 1000000L * pad / (n * c)
    Seq(
      ("bestfit_ffd", c, nDocs, total, nFfd, padFfd,
        waste(padFfd, nFfd), maxPadFfd),
      ("stream_split", c, nDocs, total, nStream, padStream,
        waste(padStream, nStream), padStream))
      .toDF("method", "capacity", "n_docs", "total_tokens", "n_shards",
        "pad_tokens", "waste_ppm", "max_shard_pad")
      .orderBy("method")
  }
}
