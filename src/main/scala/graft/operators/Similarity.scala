package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Partitioning, VectorOps => V}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`). Two paths:
  *
  *  - [[knnBrute]]: exact brute-force cosine top-k. The QUERY side is
  *    broadcast (it is small by construction); the base table streams
  *    through a BroadcastNestedLoopJoin, so the scan parallelism is
  *    the base table's partitioning — the right shape for "few
  *    queries vs 100 TB of vectors". Top-k per query is a window
  *    row_number; at extreme scale this becomes a partial top-k
  *    aggregate, but the per-query candidate set is already bounded
  *    by the broadcast side here.
  *  - [[knnLshBucketed]]: the scale path — candidates are restricted
  *    to vectors sharing at least one sign-LSH band bucket with the
  *    query (same banding as Dedup.embeddingNearDup), turning the
  *    cross join into an equi-join on (band, bucket) that Spark
  *    shuffles/broadcasts like any other join. Recall < 1 by design.
  *
  * All similarity math is exact-integer quantized cosine (see
  * VectorOps) so results hash-match the DuckDB oracle.
  */
object Similarity {

  private[operators] def quantized(embeddings: DataFrame): DataFrame =
    Partitioning.spread(embeddings)
      // Generate-bind (explode of a 1-element array): downstream
      // consumers reference qe many times (norms, per-centroid dots)
      // and project-collapse + filter-pushdown would otherwise
      // re-inline the quantize() HOF into every reference
      .select(col("vec_id"),
        explode(array(V.quantize(col("embedding")))).as("qe"))
      .select(col("vec_id"), col("qe"), V.qnorm2(col("qe")).as("qn"))
      .where(col("qn") > 0)

  /** Exact top-k cosine neighbors for each query vector (queries =
    * vec_id < nQueries; self-pairs excluded). */
  def knnBrute(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    val base = quantized(embeddings)
    val queries = base.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("qe").as("qq"), col("qn").as("nq"))
    val scored = base.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        V.cosPpm(V.qdot(col("qq"), col("qe")), col("nq"), col("qn")).as("cos_ppm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_ppm")
      .orderBy("query_id", "rank")
  }

  /** IVF (inverted-file) top-k ANN — the codebook path:
    *  - coarse codebook = the quantized vectors of the first
    *    `nCentroids` ids (deterministic sampled training; a k-means
    *    fit would slot in the same place). The codebook is a tiny
    *    MODEL: collected once and re-broadcast as literals, like
    *    TextAnalysis.langId's profiles.
    *  - assignment: row-local exact-integer argmin of squared L2
    *    (‖a‖² + ‖c‖² − 2a·c) — zero shuffles, ties to lowest cid.
    *  - search: the query probes its `nProbe` nearest centroids and
    *    scans only those inverted lists (the join on cid IS the
    *    inverted-list scan), then exact quantized-cosine top-k.
    * Recall < 1 by design; candidates shrink by ~nProbe/nCentroids. */
  def knnIvf(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5,
             nCentroids: Int = 8, nProbe: Int = 2): DataFrame = {
    val base = quantized(embeddings)
    val cents: Seq[(Long, Seq[Long], Long)] = base
      .where(col("vec_id") < nCentroids)
      .select("vec_id", "qe", "qn").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    val distStructs = cents.map { case (cid, ce, cn) =>
      val dot = aggregate(zip_with(col("qe"), typedLit(ce), (x, y) => x * y),
        lit(0L), (a, v) => a + v)
      struct((col("qn") + cn - lit(2L) * dot).as("dist"), lit(cid).as("cid"))
    }
    val byDist = array_sort(array(distStructs: _*))
    val assign = base.select(col("vec_id"), col("qe"), col("qn"),
      element_at(byDist, 1).getField("cid").as("cid"))
    val probes = base.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        explode(transform(slice(byDist, 1, nProbe), s => s.getField("cid")))
          .as("cid"))
    val scored = assign.join(broadcast(probes), Seq("cid"))
      .where(col("vec_id") =!= col("query_id"))
      .join(broadcast(base.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("qe").as("qq"),
          col("qn").as("nq"))), "query_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        V.cosPpm(V.qdot(col("qq"), col("qe")), col("nq"), col("qn")).as("cos_ppm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_ppm")
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed top-k: same contract as [[knnBrute]] but candidates
    * are limited to same-band-bucket vectors (approximate recall). */
  def knnLshBucketed(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5,
                     nBands: Int = 4, bitsPerBand: Int = 4): DataFrame = {
    val base = quantized(embeddings)
    val banded = embeddings.select(col("vec_id"),
      posexplode(array((0 until nBands).map(b =>
        V.signBucket(col("embedding"), b, bitsPerBand)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val queryBands = banded.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("band"), col("bucket"))
    val candidates = banded.join(broadcast(queryBands), Seq("band", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id")).distinct()
    val scored = candidates
      .join(base.select(col("vec_id").as("neighbor_id"), col("qe"), col("qn")), "neighbor_id")
      .join(broadcast(base.select(col("vec_id").as("query_id"),
        col("qe").as("qq"), col("qn").as("nq"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        V.cosPpm(V.qdot(col("qq"), col("qe")), col("nq"), col("qn")).as("cos_ppm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_ppm")
      .orderBy("query_id", "rank")
  }
}
