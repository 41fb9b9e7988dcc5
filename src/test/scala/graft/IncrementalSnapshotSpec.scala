package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import graft.operators.Dedup

/** The r6 bucketed-corpus ingest contract: the nightly corpus LSH
  * band snapshot is written bucketed on the band-join key, so a
  * daily-ingest probe joins it with ZERO corpus-side exchange — the
  * (small) batch shuffles, the (100 TB) corpus does not. Asserted
  * two ways per family (text MinHash + vector sign-LSH): the plan
  * contains a sort-merge band join whose bucketed-scan side is
  * exchange-free, and the snapshot path is row-identical to the
  * direct (unbucketed) operator. */
class IncrementalSnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def bucketScanIn(p: SparkPlan): Boolean =
    p.collect {
      case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
    }.nonEmpty

  /** True iff some SMJ has a side that reads the bucketed snapshot
    * with no shuffle below it (upper joins legitimately contain
    * exchanges, so `exists` over all joins finds the band join). */
  private def corpusSideExchangeFree(p: SparkPlan): Boolean =
    p.collect { case j: SortMergeJoinExec => j }.exists { j =>
      Seq(j.left, j.right).exists(s => bucketScanIn(s) &&
        s.collect { case e: ShuffleExchangeExec => e }.isEmpty)
    }

  private def withPlanAuditConf[A](body: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try body
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("text ingest: bucketed band snapshot joins with no corpus-side exchange") {
    withPlanAuditConf {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val batch = docs.where(col("doc_id") % 10 === 0)
      val corpus = docs.where(col("doc_id") % 10 =!= 0)
      try {
        Dedup.writeCorpusBandSnapshot(corpus, "corpus_bands_b", nBuckets = 4)
        val out = Dedup.incrementalAgainstSnapshot(batch,
          spark.table("corpus_bands_b"), corpus.select("text"))
        assert(corpusSideExchangeFree(out.queryExecution.executedPlan),
          "band join must read the bucketed corpus snapshot without an " +
            s"exchange:\n${out.queryExecution.executedPlan}")
        // snapshot path ≡ direct path
        val direct = Dedup.incremental(batch, corpus).collect().toSeq
        val snap = out.collect().toSeq
        assert(snap == direct)
        assert(snap.nonEmpty)
      } finally spark.sql("DROP TABLE IF EXISTS corpus_bands_b")
    }
  }

  test("vector ingest: bucketed sign-LSH snapshot joins with no corpus-side exchange") {
    withPlanAuditConf {
      val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val batch = em.where(pmod(col("vec_id"), lit(10L)) === 7)
      val corpus = em.where(pmod(col("vec_id"), lit(10L)) =!= 7)
      try {
        Dedup.writeVectorBandSnapshot(corpus, "vector_bands_b", nBuckets = 4)
        val out = Dedup.embeddingIncrementalAgainstSnapshot(batch,
          spark.table("vector_bands_b"), corpus)
        assert(corpusSideExchangeFree(out.queryExecution.executedPlan),
          "vector band join must read the bucketed snapshot without an " +
            s"exchange:\n${out.queryExecution.executedPlan}")
        val direct = Dedup.embeddingIncremental(em).collect().toSeq
        val snap = out.collect().toSeq
        assert(snap == direct)
        assert(snap.nonEmpty)
      } finally spark.sql("DROP TABLE IF EXISTS vector_bands_b")
    }
  }
}
