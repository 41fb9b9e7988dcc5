package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Streaming forms of the corpus-curation operators — the continuous-
  * ingest path of the training-data pipeline (documents arriving as a
  * stream get deduped / quality-gated / decontaminated before landing
  * in the corpus store). Stream shape: (ts: timestamp, doc_id: bigint,
  * text: string).
  *
  * Scale design per operator:
  *  - [[dedupStream]]: hash-exact dedup keyed on the 128-bit md5 of
  *    the text via dropDuplicatesWithinWatermark — state is ONE tiny
  *    row per distinct hash inside the watermark horizon (the hash,
  *    not the text, is the key: state size is bounded and the shuffle
  *    is on a uniform key, no text-length skew). 128 bits keep the
  *    birthday bound (~n²/2^129) negligible at any corpus size; a
  *    48-bit key would silently drop distinct colliding texts at the
  *    billions-of-docs scale this module targets.
  *  - [[qualityGate]]: stateless row-local filter — identical
  *    expressions to the batch TextAnalysis quality score, so the
  *    batch and streaming paths CANNOT diverge.
  *  - [[contaminationTag]]: the eval/benchmark shingle set is a tiny
  *    MODEL (like langId profiles) baked in as a literal array →
  *    row-local arrays_overlap, stateless — the streaming equivalent
  *    of the batch broadcast join in Dedup.contamination.
  */
object StreamingCuration {

  /** Exact streaming dedup: first arrival of each distinct text wins;
    * duplicates arriving within the watermark horizon are dropped.
    * State per key is evicted once the watermark passes it. */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs.withColumn("fp", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select("ts", "doc_id", "text")

  /** Stateless quality gate: same formula as
    * TextAnalysis.qualityScore; keeps docs with quality ≥ minPpm. */
  def qualityGate(docs: DataFrame, minPpm: Long = 750000L): DataFrame = {
    val ws = TextOps.words(col("text"))
    val nTok = size(ws).cast("long")
    val nStop = aggregate(ws, lit(0L), (acc, w) =>
      acc + when(w.isin(graft.operators.TextAnalysis.Stopwords: _*), 1L)
        .otherwise(0L))
    val stopPpm = floor(lit(1000000.0) * nStop / greatest(nTok, lit(1L)))
      .cast("long")
    val quality = lit(1000000L) - floor(stopPpm / 2L).cast("long") -
      when(nTok < 20L, 250000L).otherwise(0L)
    docs.withColumn("quality_ppm", quality)
      .where(col("quality_ppm") >= minPpm)
  }

  /** Benchmark-decontamination tag: flags docs sharing any word
    * n-gram with the (small, literal) eval-set shingle collection. */
  def contaminationTag(docs: DataFrame, evalShingles: Seq[String],
                       n: Int = 5): DataFrame =
    docs.withColumn("contaminated",
      arrays_overlap(TextOps.wordShingles(col("text"), n),
        typedLit(evalShingles)))

  /** Streaming incremental-ingest admit: drop arriving docs whose
    * content hash already exists in the STATIC corpus — a
    * stream-static LEFT ANTI join (stateless on the stream side: the
    * static relation is joined per micro-batch, re-broadcast/reused
    * by Spark). The batch form with near-dup labeling is
    * Dedup.incremental; this is its always-on ingest gate. */
  def admitStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    val corpusFp = corpus.select(md5(col("text")).as("fp")).distinct()
    docs.withColumn("fp", md5(col("text")))
      .join(corpusFp, Seq("fp"), "left_anti")
      .select("ts", "doc_id", "text")
  }
}
