package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The declared t2 relational surface (SURVEY.md §2.4): each query
  * exercises one operator of the reference's dead-letter topology as a
  * deterministic, fully-ordered batch query over the driver testdata,
  * hash-checked against a DuckDB oracle.
  *
  * Design notes (scale-first):
  *  - Every query projects the minimal column set BEFORE the wide
  *    stages, so Catalyst pushes the projection and any predicate into
  *    the parquet scan (verify with .explain: PushedFilters/ReadSchema).
  *  - ORDER BY is part of the declared contract (total order for
  *    row-hash comparison). At 100 TB a global sort is the dominant
  *    cost; it exists here only because the oracle requires a total
  *    order — the underlying operators (filter/project/aggregate) are
  *    shuffle-free or single-shuffle respectively.
  *  - No UDFs anywhere: all expressions are Catalyst built-ins and stay
  *    inside whole-stage codegen.
  */
object Queries {

  /** T2-Q1 — ok-branch of the stream split (reference operator #4/#5,
    * ErrorHandlingTopology.java:32-44): the `defaultBranch` predicate
    * re-expressed over `events` as `value >= 100.0`. */
  def q1SplitOk(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("value") >= 100.0)
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")

  /** T2-Q2 — dead-branch complement of the split (operator #4):
    * `split()` routes each record to exactly one branch; this is the
    * complement of Q1 under the same predicate. */
  def q2SplitDead(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(!(col("value") >= 100.0))
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")

  /** T2-Q3 — error-message rendering (operator #6,
    * ErrorMessageMapper.java:27-30): `<exception FQN>: <detail>` string
    * assembly on the error branch. */
  def q3ErrorRender(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(
        col("event_id"),
        concat(lit("java.lang.IllegalArgumentException: "),
               col("user_id").cast("string")).as("error_message"))
      .orderBy("event_id")

  /** T2-Q4 — safe-decode routing (operator #10,
    * DeadLetterDeserializationExceptionHandler.java:29-49): TRY_CAST
    * models Option-returning deserialization — undecodable input → NULL
    * (→ DLT route), decodable → value. */
  def q4SafeDecode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        expr("TRY_CAST(CASE WHEN event_type = 'error' THEN props " +
             "ELSE CAST(event_id AS STRING) END AS BIGINT)").as("decoded"))
      .orderBy("event_id")

  /** T2-Q5 — production size guard + truncation (operator #11,
    * DeadLetterProductionExceptionHandler.java:59-67): oversized value →
    * emptied payload so the DLT record itself fits. */
  def q5SizeGuard(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        when(col("n_chars") > 256, lit("")).otherwise(col("text")).as("safe_value"))
      .orderBy("doc_id")

  /** T2-Q6 — deterministic surrogate of the wrapping mapper (operator
    * #2, ErrorHandlingMapper.java:12-27): the observable contract is
    * length(generated) == n (SURVEY.md §2.3-4); content randomness is
    * replaced by a constant char for oracle determinism. */
  def q6MapperSurrogate(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("value") >= 0.0)
      .select(
        col("event_id"),
        expr("repeat('a', CAST(FLOOR(LEAST(value, 32.0D)) AS INT))").as("generated"))
      .orderBy("event_id")

  /** T2-Q7 — branch bookkeeping: per-branch record counts (the
    * split-totality contract — every record lands in exactly one
    * branch). Partial aggregation (map-side combine) keeps the shuffle
    * tiny: one row per event_type per partition. */
  def q7BranchCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Spark-side query registry for this module. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t2_q1_split_ok"    -> (q1SplitOk _),
    "t2_q2_split_dead"  -> (q2SplitDead _),
    "t2_q3_error_render" -> (q3ErrorRender _),
    "t2_q4_safe_decode" -> (q4SafeDecode _),
    "t2_q5_size_guard"  -> (q5SizeGuard _),
    "t2_q6_mapper"      -> (q6MapperSurrogate _),
    "t2_q7_branch_counts" -> (q7BranchCounts _),
  )

  /** DuckDB oracle SQL, column-name-aligned with the Spark results. */
  val oracles: Map[String, String] = Map(
    "t2_q1_split_ok" ->
      "SELECT event_id, user_id, event_type FROM events WHERE value >= 100.0 ORDER BY event_id",
    "t2_q2_split_dead" ->
      "SELECT event_id, user_id, event_type FROM events WHERE NOT (value >= 100.0) ORDER BY event_id",
    "t2_q3_error_render" ->
      "SELECT event_id, 'java.lang.IllegalArgumentException: ' || CAST(user_id AS STRING) AS error_message FROM events WHERE event_type = 'error' ORDER BY event_id",
    "t2_q4_safe_decode" ->
      "SELECT event_id, TRY_CAST(CASE WHEN event_type = 'error' THEN props ELSE CAST(event_id AS STRING) END AS BIGINT) AS decoded FROM events ORDER BY event_id",
    "t2_q5_size_guard" ->
      "SELECT doc_id, CASE WHEN n_chars > 256 THEN '' ELSE text END AS safe_value FROM documents ORDER BY doc_id",
    "t2_q6_mapper" ->
      "SELECT event_id, REPEAT('a', CAST(FLOOR(LEAST(value, 32.0)) AS INTEGER)) AS generated FROM events WHERE value >= 0.0 ORDER BY event_id",
    "t2_q7_branch_counts" ->
      "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
  )
}
