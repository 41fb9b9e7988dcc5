package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column math over `array<float>` columns.
  *
  * Cross-engine determinism strategy: floats are quantized to
  * integers by `floor(x * 1024)` — 1024 is a power of two, so the
  * float→double widening and the multiply are both exact, and the
  * floor is unambiguous. All dot products and norms are then exact
  * BIGINT arithmetic; the final cosine is ONE double division of
  * exact integers (plus correctly-rounded sqrt), which IEEE 754
  * guarantees bit-identical in Spark and DuckDB.
  *
  * Everything is `zip_with`/`aggregate` higher-order Catalyst
  * expressions — row-local, no UDF, no driver collect.
  */
object VectorOps {

  /** Quantization scale: power of two so `x.toDouble * Q` is exact. */
  val Q: Int = 1024

  /** array<float> → array<long> quantized by floor(x*Q) — native
    * expression (VectorExpressions); [[quantizeHof]] is the spec. */
  def quantize(v: Column): Column = vectorNative.quantize_vector(v, Q)

  /** HOF specification of [[quantize]]. */
  def quantizeHof(v: Column): Column =
    transform(v, x => floor(x.cast("double") * Q).cast("long"))

  /** Exact integer dot product of two quantized vectors — native
    * expression; [[qdotHof]] is the spec. */
  def qdot(a: Column, b: Column): Column = vectorNative.qdot(a, b)

  /** HOF specification of [[qdot]] (zip_with pads the shorter side
    * with nulls, `+` propagates → NULL on length mismatch). */
  def qdotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Exact integer squared norm of a quantized vector. */
  def qnorm2(v: Column): Column = qdot(v, v)

  /** Cosine similarity in parts-per-million as BIGINT:
    * floor((1e6 * dot) / (sqrt(na) * sqrt(nb))). Callers must guard
    * na > 0 and nb > 0 (zero vectors are excluded upstream). */
  def cosPpm(dot: Column, na: Column, nb: Column): Column =
    floor((lit(1000000.0) * dot) / (sqrt(na) * sqrt(nb))).cast("long")

  /** Sign-bit LSH bucket for band `b` over `bitsPerBand` dims:
    * bucket = sum_k (v[b*bits+k] > 0) * 2^k. Random-hyperplane LSH
    * with axis-aligned planes — deterministic and portable. */
  def signBucket(v: Column, band: Int, bitsPerBand: Int): Column =
    (0 until bitsPerBand).map { k =>
      when(get(v, lit(band * bitsPerBand + k)) > 0.0f, lit(1L << k))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Prefix-ANCHORED sign bucket (r12): band `b` reads dims
    * [b·stride + offset, b·stride + offset + bits) — the band's dim
    * block is pinned by `stride` (the maximum width), not by the
    * current width, so widening a band NEVER shifts which dims it
    * reads: bucket(w+1) = bucket(w) + bit_w·2^w, i.e. wider buckets
    * REFINE narrower ones. That is the property [[signBucket]]'s
    * packed layout lacks (band b at width w starts at dim b·w — a
    * width change re-deals every band's dims) and the one a GROWABLE
    * index needs: under anchoring, co-bucketed-at-(w+1) implies
    * co-bucketed-at-w, so a width migration is a pure candidate-set
    * filter (Similarity.knnGraphReband). `offset` slices the
    * extension bits [w, w') on their own for the migration join. */
  def signBucketAnchored(v: Column, band: Int, bits: Int,
                         stride: Int, offset: Int = 0): Column = {
    require(offset + bits <= stride,
      s"anchored band exceeds its dim block: offset $offset + bits $bits > stride $stride")
    (0 until bits).map { k =>
      when(get(v, lit(band * stride + offset + k)) > 0.0f, lit(1L << k))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
