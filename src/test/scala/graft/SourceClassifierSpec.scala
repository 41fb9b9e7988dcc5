package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CuratePipeline, TextAnalysis}

/** Laws of the r11 trained-model additions: the class-share source
  * classifier (vocabulary-sized model, join-applied) and the
  * per-source dataset-card report. The DuckDB hash compare checks
  * exact values on the corpus; these pin the semantics on
  * constructed rows — split membership, unseen-token neutrality,
  * argmax tie-breaks, and the card's integer accounting. */
class SourceClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")

  // train ids (% 5 != 0): alpha = {1, 2}, beta = {3, 4}
  // test ids (% 5 == 0): 0, 5, 10, 15
  private val fixture = docs(
    (1L, "aa bb aa", "en", "alpha"),
    (2L, "aa bb", "en", "alpha"),
    (3L, "cc dd cc", "en", "beta"),
    (4L, "cc dd", "en", "beta"),
    (0L, "aa bb", "en", "alpha"),   // clean alpha vocabulary
    (5L, "cc dd", "en", "beta"),    // clean beta vocabulary
    (10L, "zz yy", "en", "beta"),   // NO vocabulary hit at all
    (15L, "aa zz zz", "en", "alpha")) // one alpha hit + unseen noise

  test("classifier: clean-vocabulary test docs land on their source") {
    val m = TextAnalysis.sourceClassifier(fixture).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m.getOrElse(("alpha", "alpha"), 0L) >= 1L)
    assert(m.getOrElse(("beta", "beta"), 0L) >= 1L)
  }

  test("classifier: no-vocabulary doc falls to the alphabetically-first class") {
    // doc 10 scores 0 for every class -> tie-break (score desc, label
    // asc) must pick "alpha"; its true source is beta, so the
    // (beta, alpha) confusion cell carries it.
    val m = TextAnalysis.sourceClassifier(fixture).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m.getOrElse(("beta", "alpha"), 0L) == 1L)
  }

  test("classifier: unseen tokens cannot flip an argmax") {
    // doc 15: "aa" votes alpha (weight 1e6 - aa occurs only in alpha
    // training docs); "zz" is out of vocabulary and contributes 0 to
    // every class. Prediction must be alpha regardless of noise mass.
    val m = TextAnalysis.sourceClassifier(fixture).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m.getOrElse(("alpha", "alpha"), 0L) == 2L) // docs 0 and 15
  }

  test("classifier: confusion cells sum to the test-split size") {
    val total = TextAnalysis.sourceClassifier(fixture).agg(sum("n_docs"))
      .head.getLong(0)
    assert(total == 4L)
  }

  test("classifier: training docs never appear in the confusion matrix") {
    // 8 fixture docs, 4 in the test split -> the matrix accounts for
    // exactly the test docs (previous test) and every cell's labels
    // come from the training sources only.
    val labels = TextAnalysis.sourceClassifier(fixture).collect()
      .flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
    assert(labels.subsetOf(Set("alpha", "beta")))
  }

  test("source overlap: cells are source-normalized and pair-counted") {
    // identical texts across two sources -> one (books, web) cell
    // regardless of which doc id is doc_a; the unrelated doc appears
    // in no cell.
    val d = docs(
      (1L, "one two three four five six", "en", "web"),
      (2L, "one two three four five six", "en", "books"),
      (3L, "alpha beta gamma delta epsilon zeta", "en", "web"))
    val rows = graft.operators.Dedup.sourceOverlap(d).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getString(0), r.getString(1)) == ("books", "web"))
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L && r.getLong(4) == 1L)
  }

  test("report: integer accounting and the top-lang tie-break") {
    val d = docs(
      (1L, "one two three four", "en", "web"),
      (2L, "one two three four", "de", "web"), // exact dup of doc 1
      (3L, "five six seven", "de", "web"),
      (4L, "eight nine", "en", "books"))
    val rows = CuratePipeline.report(d).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("books", "web"))
    val web = rows.find(_.getString(0) == "web").get
    assert(web.getLong(1) == 3L)            // n_docs
    assert(web.getLong(2) == 4L + 4L + 3L)  // n_tokens
    assert(web.getLong(3) == 2L)            // distinct texts (1==2)
    assert(web.getLong(4) == (1L * 1000000L) / 3L) // exact_dup_ppm
    // mean quality = floor-div of the quality chain's own sum
    val q = TextAnalysis.qualityScore(d.where(col("source") === "web"))
      .agg(sum("quality_ppm")).head.getLong(0)
    assert(web.getLong(5) == q / 3L)
    assert(web.getLong(6) == 2L)            // n_langs
    // lang counts web: de=2 > en=1 -> top de; books: en only
    assert(web.getString(7) == "de")
    val books = rows.find(_.getString(0) == "books").get
    assert(books.getString(7) == "en")
    // tie case: equal lang counts fall to lang asc
    val tied = docs(
      (1L, "a b", "en", "s"), (2L, "c d", "de", "s"))
    assert(CuratePipeline.report(tied).head.getString(7) == "de")
  }
}
