package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Partitioning, TextOps}

/** Byte-pair-encoding tokenizer — the LLM tokenization step, as a
  * fit/transform pair:
  *
  *  - [[fit]]: ONE distributed aggregate builds the word-frequency
  *    table (partial-combinable; top `maxVocab` by frequency is the
  *    standard Zipf cut — rare words contribute negligible pair
  *    counts), then the inherently-sequential merge loop runs on the
  *    driver over that tiny table, exactly how production BPE
  *    trainers work (they stream the corpus once into word counts,
  *    then train in memory). The model is an ordered merge list.
  *  - [[encodeCounts]]: distributed row-local encode. Each merge pass
  *    is one projection over the exploded word table, with the pass
  *    result bound via a Generate (explode-of-1-element-array) so the
  *    16 passes chain linearly — nesting them in one expression would
  *    triple the tree per pass (slice/size/element_at each reference
  *    the input) and explode exponentially.
  *
  * Merge application is a left-to-right non-overlapping fold with the
  * accumulated tokens kept as a space-joined STRING (tokens are
  * space-free): "last token == a" is `acc == a OR acc ends with
  * ' '+a`. The DuckDB oracle replicates fit AND encode with the same
  * fold via list_reduce (ExtQueries.bpeCtes).
  */
object Bpe {

  /** One merge pass over a token array: merge adjacent (a, b) → ab
    * left-to-right non-overlapping. */
  private[graft] def mergePass(arr: Column, a: String, b: String): Column = {
    val folded = aggregate(
      slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
      element_at(arr, 1),
      (acc, x) => when(((acc === lit(a)) || acc.endsWith(" " + a))
          && (x === lit(b)), concat(acc, x))
        .otherwise(concat(acc, lit(" "), x)))
    // empty token array (empty-string word): the fold's initial
    // element_at(arr, 1) is null and split(null) would poison the
    // whole chain — pass the empty array through unchanged instead
    when(size(arr) === 0, arr).otherwise(split(folded, " "))
  }

  /** Codepoint-wise split — the SAME alphabet the native encode path
    * (TextNative.bpeEncode) tokenizes with. Splitting by UTF-16 code
    * units instead would hand the trainer surrogate halves on non-BMP
    * input, symbols the encoder could never produce — fit and
    * transform must share one symbol alphabet. */
  private def codepoints(w: String): List[String] = {
    val buf = List.newBuilder[String]
    var idx = 0
    while (idx < w.length) {
      val next = w.offsetByCodePoints(idx, 1)
      buf += w.substring(idx, next)
      idx = next
    }
    buf.result()
  }

  /** JVM form of [[mergePass]] (used by fit's driver loop; the spec
    * cross-checks the two). */
  private[operators] def applyMerge(syms: List[String],
                                    a: String, b: String): List[String] =
    syms.foldLeft(List.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  /** Learn `nMerges` ordered merges from the corpus. Tie-breaks are
    * total (count desc, then pair lexicographic) so the model is
    * deterministic and the SQL oracle can reproduce it. */
  def fit(docs: DataFrame, nMerges: Int = 16,
          maxVocab: Int = 1000): Seq[(String, String)] = {
    val wf: Seq[(List[String], Long)] = Partitioning.spread(docs)
      .select(explode(TextOps.words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc).limit(maxVocab)
      .collect().map(r =>
        (codepoints(r.getString(0)), r.getLong(1))).toSeq
    var vocab = wf
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      // drop(1), not tail: an empty-string word has NO symbols and
      // Nil.tail throws
      for ((syms, f) <- vocab; p <- syms.zip(syms.drop(1)))
        counts(p) = counts.getOrElse(p, 0L) + f
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, f) =>
          (applyMerge(syms, best._1, best._2), f)
        }
      }
    }
    merges.result()
  }

  /** Per-document BPE token counts under the given merge list —
    * native codegen'd expression (graft.functions.BpeEncode): all
    * merges applied in one tight JVM loop per word. */
  def encodeCounts(docs: DataFrame,
                   merges: Seq[(String, String)]): DataFrame =
    Partitioning.spread(docs)
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
      .select(col("doc_id"),
        size(graft.functions.textNative.bpe_encode(col("w"), merges)).as("nt"))
      .groupBy("doc_id")
      .agg(sum(col("nt")).as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** HOF executable specification of [[encodeCounts]]: one Generate-
    * bound [[mergePass]] projection per merge (BpeSpec asserts
    * equality with the native path). */
  private[graft] def encodeCountsHof(docs: DataFrame,
                                     merges: Seq[(String, String)]): DataFrame = {
    val words = Partitioning.spread(docs).select(col("doc_id"),
      explode(TextOps.words(col("text"))).as("w"))
    // empty-string words (empty doc, doubled space) must yield ZERO
    // tokens like the native path: sequence(1, 0) defaults to step -1
    // and would fabricate [1, 0] -> two empty tokens
    val chars = words.select(col("doc_id"), explode(array(
      when(length(col("w")) === 0, typedLit(Seq.empty[String]))
        .otherwise(transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1)))))).as("toks"))
    val encoded = merges.foldLeft(chars) { case (df, (a, b)) =>
      df.select(col("doc_id"),
        explode(array(mergePass(col("toks"), a, b))).as("toks"))
    }
    encoded.groupBy("doc_id")
      .agg(sum(size(col("toks"))).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Fit-then-encode convenience (the declared tx_bpe query). */
  def tokenize(docs: DataFrame, nMerges: Int = 16): DataFrame =
    encodeCounts(docs, fit(docs, nMerges))

  /** Tokenizer fertility (r5): BPE tokens per word in ppm — THE
    * standard tokenizer-evaluation metric (a vocabulary mismatched to
    * the corpus yields high fertility = more sequence positions per
    * word = more compute per document; multilingual pipelines track
    * it per language). Composes [[tokenize]] with one row-local
    * word-count projection; the final join is doc-keyed. */
  def fertility(docs: DataFrame, nMerges: Int = 16): DataFrame = {
    val words = graft.functions.Partitioning.spread(docs)
      .select(col("doc_id"),
        size(graft.functions.TextOps.words(col("text"))).cast("long")
          .as("n_words"))
    tokenize(docs, nMerges).join(words, "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        floor(lit(1000000.0) * col("n_bpe_tokens")
          / greatest(col("n_words"), lit(1L))).cast("long")
          .as("fertility_ppm"))
      .orderBy("doc_id")
  }
}
