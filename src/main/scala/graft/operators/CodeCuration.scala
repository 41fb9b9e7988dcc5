package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Partitioning, PortableHash => PH}

/** Code-corpus curation: the source-file arm of a training-data
  * pipeline (The Stack / StarCoder-style), where near-duplication is
  * defined over *structure*, not raw bytes — two files that differ
  * only in identifier names and comments are the same training
  * example and must dedup together.
  *
  * The corpus has no source files, so — exactly like the image/audio/
  * video families (Multimodal.syntheticOrientedRasters et al.) — the
  * declared queries derive a DETERMINISTIC code rendering from each
  * document and then run the real operator chain on the rendered
  * text. The rendering salts every identifier with the doc id
  * ([[ident]]), so raw-byte shingles never match across documents;
  * only the normalization pass ([[normalizeCode]]: identifier
  * canonicalization + comment stripping) can recover the structural
  * similarity. The DuckDB oracle proves the chain end-to-end in two
  * complementary ways:
  *   - `tx_code_meta`: the oracle RE-RENDERS the file byte-for-byte
  *     in SQL and computes the same metadata with its own regex
  *     engine — a byte-level render-parity check;
  *   - `dd_code_neardup`: the oracle computes the IDEAL
  *     identifier-free result straight from the word stream (the
  *     "upright formula" pattern of mm_phash_oriented) — a wrong
  *     normalization regex or comment-strip order fails the hash.
  *
  * Everything is row-local Catalyst projection (split / transform /
  * regexp) until the single pair-join shuffle inside
  * [[Dedup.codeNearDup]] — at 100 TB the render+normalize+gram stage
  * is embarrassingly parallel over the scan and the join is the same
  * df-capped inverted index every other dedup family rides.
  */
object CodeCuration {

  /** Identifier slot for word position `i` (0-based) of a document:
    * `_v<h31(doc_id:i) % 997>` — salted by doc id so identical word
    * streams render with DIFFERENT identifier names per document
    * (the property the normalization pass must undo). Collisions
    * mod 997 inside a doc are fine: deterministic on both engines.
    * The leading underscore keeps the identifier namespace DISJOINT
    * from corpus words: the probe corpus embeds variant-marker words
    * `v1`/`v2`, and a bare `v<digits>` pattern made the normalizer
    * eat real content (10x-probe catch, r10) — underscore never
    * occurs in a corpus token. */
  private def ident(docId: Column, i: Column): Column =
    concat(lit("_v"),
      (PH.h31(concat(docId.cast("string"), lit(":"), i.cast("string")))
        % 997).cast("string"))

  /** Deterministic source-file rendering of a document: one `val`
    * statement per word, identifier-chained, each with a trailing
    * line comment — enough surface (header, identifiers, call chain,
    * comments, return) for the normalization/metadata operators to
    * exercise every rule. Pure projection; the per-element lambda
    * only touches its own element and two row-local md5s. */
  def renderCode(docs: DataFrame): DataFrame = {
    val ws = split(col("text"), " ")
    val docId = col("doc_id")
    val stmts = transform(ws, (w, i) =>
      concat(lit("  "), ident(docId, i), lit(" = lib."), w, lit("("),
        when(i === 0, lit("seed")).otherwise(ident(docId, i - 1)),
        lit(")  # s"), i.cast("string")))
    val code = concat(
      lit("def f_"), docId.cast("string"), lit("():\n"),
      concat_ws("\n", stmts),
      lit("\n  return "), ident(docId, size(ws) - 1))
    docs.select(docId, code.as("code"))
  }

  /** Structural normalization: canonicalize identifiers (`v<digits>`
    * -> `V`) and strip line comments. The regex subset is chosen for
    * identical semantics in Java regex (Spark) and RE2 (DuckDB) —
    * same discipline as piiScrub. */
  def normalizeCode(code: Column): Column =
    regexp_replace(regexp_replace(code, "  # s[0-9]+", ""),
      "_v[0-9]+", "V")

  /** Statement lines of a (normalized) rendering — header and return
    * line excluded, so downstream grams are identifier-free AND
    * doc-id-free. */
  private def stmtLines(code: Column): Column =
    filter(split(code, "\n"), l => l.contains(" = lib."))

  /** Distinct md5 n-grams over consecutive statements. md5 gives the
    * fixed-width join key the pair join wants (statement text is
    * unbounded). */
  private def stmtGrams(stmts: Column, n: Int): Column =
    array_distinct(filter(
      transform(stmts, (_, i) =>
        when(i + lit(n) <= size(stmts),
          md5(concat_ws(" | ", slice(stmts, i + 1, lit(n)))))),
      g => g.isNotNull))

  /** Exploded (doc_id, sh) gram table over the FULL chain: render ->
    * normalize -> statement extraction -> statement n-grams. Input to
    * [[Dedup.codeNearDup]]. Files with fewer than `n` statements have
    * no grams and drop out (same on both engines). */
  def codeGramTable(docs: DataFrame, n: Int = 4): DataFrame =
    Partitioning.spread(renderCode(docs))
      .select(col("doc_id"),
        explode(stmtGrams(stmtLines(normalizeCode(col("code"))), n)).as("sh"))

  /** Raw-byte gram table (NO normalization) — exists to prove the
    * negative: doc-salted identifiers make raw statement grams
    * disjoint across documents, so byte-level dedup on rendered code
    * finds nothing (CodeAssemblySpec asserts zero pairs); only the
    * normalization pass recovers the structural similarity. */
  private[graft] def codeGramTableRaw(docs: DataFrame, n: Int = 4): DataFrame =
    Partitioning.spread(renderCode(docs))
      .select(col("doc_id"),
        explode(stmtGrams(stmtLines(col("code")), n)).as("sh"))

  /** Per-file code metadata — the file-level filter signals a code
    * pipeline gates on (The Stack drops files by line length /
    * generated-code markers / comment density). Computed off the
    * ACTUAL rendered string with row-local regexes; the oracle
    * re-renders in SQL and recomputes with RE2. */
  def codeMeta(docs: DataFrame): DataFrame = {
    val code = col("code")
    val lines = split(code, "\n")
    renderCode(docs).select(
      col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      length(code).cast("long").as("n_chars"),
      array_max(transform(lines, l => length(l))).cast("long")
        .as("max_line_len"),
      size(regexp_extract_all(code, lit("_v[0-9]+"), lit(0))).cast("long")
        .as("n_ident_refs"),
      size(array_distinct(regexp_extract_all(code, lit("_v[0-9]+"), lit(0))))
        .cast("long").as("n_distinct_idents"),
      size(regexp_extract_all(code, lit("# s[0-9]+"), lit(0))).cast("long")
        .as("n_comments"))
      .orderBy("doc_id")
  }
}
