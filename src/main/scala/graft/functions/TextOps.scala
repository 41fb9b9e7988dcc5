package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization / shingling column builders shared by the dedup and
  * text-analysis operators. Pure Catalyst built-ins and higher-order
  * functions — no UDFs, no serialization boundary, distributed by
  * construction (each expression evaluates row-local; the only
  * shuffles in downstream operators are their explicit groupBy/join
  * keys).
  *
  * Every builder has a matching DuckDB-dialect fragment in
  * `graft.relational.ExtOracles` — the pair must stay semantically
  * identical (same 1-based indexing, same NULL propagation on
  * out-of-range word access) for the t2 hash compare.
  */
object TextOps {

  /** Whitespace tokens (the corpus is single-space separated). */
  def words(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles, joined by a single space — the
    * native codegen'd expression (TextExpressions.WordShingles).
    * [[wordShinglesHof]] is the executable specification; equality
    * asserted in TextNativeSpec. */
  def wordShingles(text: Column, n: Int): Column =
    textNative.word_shingles(text, n)

  /** HOF specification of [[wordShingles]]: zip_with over n shifted
    * slices of the word array. (NOT transform(sequence, i -> ws[i]…):
    * higher-order lambdas are interpreted — no codegen, no CSE — so
    * an indexed lambda re-evaluates split(text) per element access,
    * O(shingles × n) splits per row; the slice form does n splits per
    * ROW, measured ~10× faster; the native expression does one.)
    * A doc with fewer than n words produces an empty shingle set. */
  def wordShinglesHof(text: Column, n: Int): Column = {
    val ws = words(text)
    val len = greatest(size(ws) - lit(n - 1), lit(0))
    val grams = (2 to n).foldLeft(slice(ws, lit(1), len)) { (acc, k) =>
      zip_with(acc, slice(ws, lit(k), len), (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(grams)
  }

  /** ALL word n-gram occurrences (NON-distinct, order-preserving) —
    * multiplicity matters for repetition signals, where
    * [[wordShingles]]' distinct sets would erase the evidence.
    * Native expression since r17 ([[wordShinglesAllHof]] is the
    * executable spec): the slice/zip_with chain paid one interpreted
    * zip_with pass per extra gram word — ~16 s of task CPU in
    * dd_span_scrub's fan-out stage at sf0.1. */
  def wordShinglesAll(text: Column, n: Int): Column =
    textNative.word_shingles_all(text, n)

  /** HOF executable specification of [[wordShinglesAll]] (asserted
    * equal in TextNativeSpec). */
  private[graft] def wordShinglesAllHof(text: Column, n: Int): Column = {
    val ws = words(text)
    val len = greatest(size(ws) - lit(n - 1), lit(0))
    (2 to n).foldLeft(slice(ws, lit(1), len)) { (acc, k) =>
      zip_with(acc, slice(ws, lit(k), len), (a, b) => concat(a, lit(" "), b))
    }
  }

  /** Distinct character trigrams (native expression; codepoint
    * semantics identical to substr). */
  def charTrigrams(text: Column): Column =
    textNative.char_trigrams(text)

  /** HOF specification of [[charTrigrams]] (1-based positions;
    * trailing <3-char windows excluded on both engines). */
  def charTrigramsHof(text: Column): Column = {
    val idx = sequence(lit(1), greatest(length(text) - lit(2), lit(1)))
    val grams = transform(idx, i => text.substr(i, lit(3)))
    array_distinct(filter(grams, g => length(g) === 3))
  }

  /** Soundex phonetic key (r7 continuation) as an EXPLICIT
    * translate + regexp chain rather than Spark's built-in
    * `soundex()` — deliberately: the built-in's H/W-transparency and
    * first-letter edge semantics are not restatable in DuckDB, and a
    * blocking key is only useful if BOTH engines derive the
    * identical code. The chain (classic SQL-soundex formulation,
    * H/W removed before run-collapse — the Knuth H/W-transparency
    * rule falls out for free):
    *   1. uppercase; 2. translate consonant classes to digits
    *   1–6, vowels+Y to 0, H/W deleted (both engines delete
    *   unmatched translate chars); 3. collapse same-digit runs;
    *   4. drop the first digit (the first letter's own code);
    *   5. strip zeros; 6. first letter + first 3 digits, 0-padded.
    * Verified landmarks: Robert→R163, Pfister→P236, Tymczak→T522,
    * Ashcraft→A261. Pure codegen'd built-ins — the key is a
    * projection, and blocking on it is an ordinary groupBy. */
  def soundex6(word: Column): Column = {
    val u = upper(word)
    val d = translate(u, "BFPVCGJKQSXZDTLMNRAEIOUYHW",
      "111122222222334556000000")
    val collapsed = (0 to 6).foldLeft(d)((c, i) =>
      regexp_replace(c, s"$i$i+", s"$i"))
    val digits = regexp_replace(substring(collapsed, 2, 64), "0", "")
    concat(substring(u, 1, 1), substring(concat(digits, lit("000")), 1, 3))
  }
}
