package graft

import org.scalatest.funsuite.AnyFunSuite

/** Rerun-determinism guard: every declared query must produce
  * IDENTICAL rows across two independent executions — the property
  * the whole oracle strategy (and any retried cluster stage) rests
  * on. Catches accidental rand()/monotonic_id/unordered-collect
  * creep in future edits. Runs at sf0.001 to stay fast. */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // the nondeterminism-prone families: hashing, LSH joins, windows,
  // iterative fixpoint, model-collect, RNG surrogate
  private val watchlist = Seq("dd_minhash_lsh", "dd_simhash", "dd_clusters",
    "dd_embed_neardup", "sim_knn_ivf", "tx_langid", "tx_split",
    "rel_top_orders", "rel_sessions", "pipeline_curate", "x_approx_users",
    // r2 additions with fit-collects, windows, or sampling hashes
    "dd_kmeans", "dd_semdedup", "tx_bpe", "tx_tfidf", "tx_sample_mix",
    "tx_sample_strat", "tx_quality_filter", "pipeline_curate_full",
    "x_compress_ratio",
    // r4 additions with fit-collects, distributed builds, or windows
    "sim_knn_ivfpq", "sim_knn_ivfpq_rerank", "x_knn_pq_trained",
    "dd_contamination_bloomdist", "tx_word_familiarity", "rel_user_gaps",
    // r9 additions with fit-collects (LPM Cramer), sampled evals,
    // k-means arms, or row-local rank arrays
    "tx_quality_lpm", "dd_embed_blocker_recall", "sim_knn_stream",
    "dd_video_neardup", "dd_blocker_recall", "dd_lsh_recall_sampled",
    // r9-continuation additions: fit-collect (MIPS-IVF centroids),
    // LSH-style candidate joins, top-k windows
    "sim_mips", "sim_mips_ivf", "dd_edit_verified", "dd_audio_neardup",
    "tx_bm25",
    // r10 additions: hash-salted render (code grams), global windows
    // (mix/shard totals), dimension-join render
    "dd_code_neardup", "tx_code_meta", "tx_mix_plan", "tx_shard_plan",
    "sim_knn_graph", "sim_knn_graph_wide", "rel_merge_upsert")

  test("watchlist queries are identical across two executions") {
    watchlist.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf).collect().map(_.toString).toSeq
      val b = fn(spark, sf).collect().map(_.toString).toSeq
      assert(a == b, s"$name differs across reruns")
    }
  }
}
