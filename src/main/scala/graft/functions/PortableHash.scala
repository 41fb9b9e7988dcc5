package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * The t2 harness compares Spark results against a DuckDB oracle by
  * stringified value, so every hash used by a declared query must be
  * computable — bit for bit — in both engines. Neither Spark's
  * `hash()` (Murmur3) nor DuckDB's `hash()` are portable, but `md5()`
  * over UTF-8 is: we take the first 12 hex chars (48 bits, < 2^53 so
  * also exact through any double round-trip) as the base hash and
  * derive affine families `(a*h + b) mod P31` from it for MinHash.
  *
  * All arithmetic stays strictly inside 63 bits: operands are reduced
  * mod P31 = 2^31 - 1 first, and every multiplier is < 2^31, so
  * products are < 2^62 — no overflow in either engine (DuckDB errors
  * on BIGINT overflow; Spark under ANSI mode does too).
  *
  * Everything here is composed from Catalyst built-ins (md5, conv,
  * substring, pmod) — no UDFs, stays codegen-friendly and pushes into
  * whole-stage codegen.
  */
object PortableHash {

  /** Mersenne prime 2^31 - 1: modulus for all derived hash families. */
  val P31: Long = 2147483647L

  /** Rolling-hash base for document fingerprints (see TextAnalysis). */
  val FpBase: Long = 1000003L

  /** 48-bit portable hash: integer value of the first 12 hex chars of
    * md5(s). Identical in Spark (`conv(substring(md5(s),1,12),16,10)`)
    * and DuckDB (`('0x' || substr(md5(s),1,12))::BIGINT`). */
  def h48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** h48 reduced into [0, P31). */
  def h31(c: Column): Column = h48(c) % P31

  /** DuckDB-dialect SQL fragment computing the same value as [[h48]]. */
  def h48Sql(e: String): String =
    s"(('0x' || substr(md5($e), 1, 12))::BIGINT)"

  /** DuckDB-dialect SQL fragment computing the same value as [[h31]]. */
  def h31Sql(e: String): String = s"(${h48Sql(e)} % $P31)"

  /** Fixed affine MinHash family: minhash_j = min over shingles of
    * (A(j)*h31 + B(j)) mod P31. Literal constants (all < 2^31) shared
    * verbatim with the DuckDB oracle SQL. 16 permutations = 8 bands
    * of 2 rows at the declared LSH parameters. */
  val MinhashA: IndexedSeq[Long] = IndexedSeq(
    1103515245L, 1588635695L, 1117695901L, 213908441L,
    1300891595L, 741103597L, 1376312589L, 987654323L,
    122949829L, 921919183L, 715225741L, 1500450271L,
    179424691L, 32452867L, 512927377L, 982451653L)

  val MinhashB: IndexedSeq[Long] = IndexedSeq(
    12345L, 1013904223L, 511111111L, 328611731L,
    999999937L, 87654321L, 715827883L, 400714139L,
    268435459L, 1442968193L, 22801763L, 1873L,
    96962093L, 573259391L, 786433L, 314159265L)

  val MinhashK: Int = MinhashA.length

  /** Rotation-densification offset for the one-permutation-hashing
    * signature family (Dedup.ophSignatures); shared verbatim with
    * the DuckDB oracle. Any value < 2^31 works (slot sums stay
    * < 2^32, far inside 63-bit arithmetic). */
  val OphC: Long = 814309L

  /** j-th affine permutation of an h31 value (Column form). */
  def affine(j: Int)(h: Column): Column =
    (h * MinhashA(j) + MinhashB(j)) % P31

  /** j-th affine permutation (DuckDB SQL fragment form). */
  def affineSql(j: Int)(e: String): String =
    s"((($e) * ${MinhashA(j)} + ${MinhashB(j)}) % $P31)"
}
