package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash => PH, TextOps}

/** Text-analysis operator family over `documents` — token counting,
  * quality scoring, corpus-trained n-gram language ID, and document
  * fingerprinting. All row-local Catalyst expressions except langId,
  * whose profile build is a deliberately tiny aggregate (|langs| ×
  * top-N trigrams) that Spark broadcast-joins back to the corpus.
  */
object TextAnalysis {

  /** Corpus stopwords for ratio features (fixed literal set). */
  val Stopwords: Seq[String] = Seq("the", "a")

  /** Token counting: whitespace tokens, alpha runs (regex), numeric
    * runs (regex), and a BPE-ish subword count (ceil(len/4) chunks
    * per word — a deterministic stand-in for byte-pair merges). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        size(TextOps.words(col("text"))).cast("long").as("n_ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+")).cast("long").as("n_alpha_tokens"),
        regexp_count(col("text"), lit("[0-9]+")).cast("long").as("n_num_tokens"),
        aggregate(TextOps.words(col("text")), lit(0L),
          (acc, w) => acc + floor((length(w) + 3) / 4).cast("long"))
          .as("n_subword_tokens"))
      .orderBy("doc_id")

  /** Quality scoring: integer/ppm features only (portable):
    * n_tokens, mean token length (ppm), stopword ratio (ppm), and a
    * composite quality score in ppm. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val ws = TextOps.words(col("text"))
    val nTok = size(ws).cast("long")
    // total token chars = len(text) - (n_tok - 1) separators
    val tokChars = length(col("text")).cast("long") - (nTok - 1)
    val nStop = aggregate(ws, lit(0L),
      (acc, w) => acc + when(w.isin(Stopwords: _*), 1L).otherwise(0L))
    docs.select(col("doc_id"), nTok.as("n_tokens"),
        floor(lit(1000000.0) * tokChars / greatest(nTok, lit(1L)))
          .cast("long").as("mean_token_len_ppm"),
        floor(lit(1000000.0) * nStop / greatest(nTok, lit(1L)))
          .cast("long").as("stopword_ratio_ppm"))
      .withColumn("quality_ppm",
        (lit(1000000L) - floor(col("stopword_ratio_ppm") / 2L).cast("long")
          - when(col("n_tokens") < 20L, 250000L).otherwise(0L)).cast("long"))
      .orderBy("doc_id")
  }

  /** Corpus-trained character-trigram language ID (Cavnar–Trenkle
    * style, document-frequency variant): per-language profiles = top
    * `profileN` trigrams by document frequency (ties broken by
    * trigram text); a document's score for a language = |doc's
    * distinct trigrams ∩ profile|; prediction = argmax score (ties
    * broken by language code). The profile table is tiny (|langs| ×
    * profileN) → broadcast join back to the corpus. */
  def langId(docs: DataFrame, profileN: Int = 20): DataFrame = {
    // one row per (doc, distinct trigram); reused for profile + score
    val docTg = docs.select(col("doc_id"), col("lang"),
      explode(TextOps.charTrigrams(col("text"))).as("tg"))
    val counts = docTg.groupBy("lang", "tg").agg(count(lit(1)).as("c"))
    val profRank = Window.partitionBy("lang")
      .orderBy(col("c").desc, col("tg").asc)
    val profiles = counts.withColumn("r", row_number().over(profRank))
      .where(col("r") <= profileN)
      .select(col("lang").as("plang"), col("tg"))
    val scores = docTg.select("doc_id", "tg")
      .join(broadcast(profiles), "tg")
      .groupBy("doc_id", "plang").agg(count(lit(1)).as("score"))
    val best = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("plang").asc)
    scores.withColumn("r", row_number().over(best)).where(col("r") === 1)
      .select(col("doc_id"), col("plang").as("pred_lang"), col("score"))
      .orderBy("doc_id")
  }

  /** Document fingerprint: order-sensitive rolling polynomial hash
    * over the word sequence, h = fold(h*B + h31(w) mod P31), a
    * row-local sequential fold (aggregate HOF) — the classic
    * content-defined fingerprint, exact in both engines. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        aggregate(TextOps.words(col("text")), lit(0L),
          (h, w) => (h * PH.FpBase + PH.h31(w)) % PH.P31)
          .as("fingerprint"))
      .orderBy("doc_id")
}
