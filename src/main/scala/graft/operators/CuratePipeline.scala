package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composite training-data curation pipeline — the use-case the
  * extension operators exist for, composed end-to-end:
  *
  *   keep a document iff
  *     1. it is its exact-dedup representative (min doc_id per text),
  *     2. its quality score clears `minQualityPpm`,
  *     3. it is not the losing side (larger doc_id) of a MinHash-LSH
  *        near-duplicate pair at `minEstJaccardPpm`.
  *
  * Plan shape at scale: (1) is one hash-agg + one join on text-key;
  * (2) is row-local; (3) is the LSH candidate join followed by a
  * LEFT ANTI join (no data amplification: losers is a small distinct
  * set of ids). Nothing here collects to the driver.
  */
object CuratePipeline {

  def curate(spark: SparkSession, docs: DataFrame,
             minQualityPpm: Long = 750000L,
             minEstJaccardPpm: Long = 750000L): DataFrame = {
    val reps = Dedup.exact(docs).select("doc_id")
    val quality = TextAnalysis.qualityScore(docs)
      .select("doc_id", "quality_ppm")
    // AUTO-banded blocker (r12): the flagship composite deploys the
    // corpus-count-derived (b, r), never the hand-fixed 8×2 — the
    // pipeline_index_auto convention applied to the text side
    val losers = Dedup.minhashLshAuto(docs)
      .where(col("est_jaccard_ppm") >= minEstJaccardPpm)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.select("doc_id", "lang", "source", "n_chars")
      .join(reps, "doc_id")
      .join(quality, "doc_id")
      .where(col("quality_ppm") >= minQualityPpm)
      .join(losers, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** The WEB-corpus curation composite (r5 — composes the r5 operator
    * additions end-to-end): keep a document iff
    *   1. its paragraph-duplication fraction is below `maxDupPpm`
    *      ([[Dedup.paragraphDedup]] — boilerplate-heavy pages drop),
    *   2. its quality score clears `minQualityPpm`,
    *   3. it survives temperature resampling
    *      ([[TextAnalysis.sampleTemperature]] — corpus-derived
    *      per-language rates rebalance the mix);
    * emit (doc_id, lang, domain) with the domain from the canonical
    * URL ([[TextAnalysis.urlParts]] over `urlDocs`).
    *
    * Plan shape: three independent per-doc signals (each its own
    * bounded-shuffle pipeline) meet in doc-keyed equi-joins; the URL
    * parse is a row-local projection. Nothing collects beyond
    * sampleTemperature's lang-count model. */
  def curateWeb(spark: SparkSession, docs: DataFrame, urlDocs: DataFrame,
                maxDupPpm: Long = 500000L,
                minQualityPpm: Long = 750000L): DataFrame = {
    val lowDup = Dedup.paragraphDedup(docs)
      .where(col("dup_ppm") < maxDupPpm).select("doc_id")
    val quality = TextAnalysis.qualityScore(docs)
      .select("doc_id", "quality_ppm")
      .where(col("quality_ppm") >= minQualityPpm)
      .select("doc_id")
    val sampled = TextAnalysis.sampleTemperature(docs)
      .select("doc_id", "lang")
    val domains = TextAnalysis.urlParts(urlDocs, "url")
      .select("doc_id", "domain")
    sampled.join(lowDup, "doc_id").join(quality, "doc_id")
      .join(domains, "doc_id")
      .select("doc_id", "lang", "domain")
      .orderBy("doc_id")
  }

  /** Per-domain quality rollup (r5) — the domain-blocklist builder:
    * for each registrable domain (from the canonical URL), document
    * count, mean quality and mean paragraph-duplication rate. Web
    * pipelines cut whole domains on these aggregates before paying
    * per-document model costs.
    *
    * Shape: two per-doc signal pipelines + a row-local URL parse meet
    * in doc-keyed joins; the final aggregate is |domains|-bounded
    * with map-side partials. Means are floor(sum/count) of exact
    * integer ppms — portable (sums ≪ 2^53). */
  def domainQuality(spark: SparkSession, docs: DataFrame,
                    urlDocs: DataFrame): DataFrame = {
    val domains = TextAnalysis.urlParts(urlDocs, "url")
      .select("doc_id", "domain")
    val quality = TextAnalysis.qualityScore(docs)
      .select("doc_id", "quality_ppm")
    val dup = Dedup.paragraphDedup(docs).select("doc_id", "dup_ppm")
    domains.join(quality, "doc_id").join(dup, "doc_id")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        floor(sum("quality_ppm") / count(lit(1))).cast("long")
          .as("mean_quality_ppm"),
        floor(sum("dup_ppm") / count(lit(1))).cast("long")
          .as("mean_dup_ppm"))
      .orderBy("domain")
  }

  /** End-to-end ASSEMBLY composite (r10): curation → per-language
    * context-window packing → shard MANIFEST — the artifact a
    * training launch actually consumes (which shards exist, how many
    * docs/tokens each holds, the doc-id range for reproducibility).
    * Composes [[curate]] (admit) with
    * [[TextAnalysis.tokenPackBy]] (the partitioned, 100 TB-shaped
    * packing window) and reduces to a |lang × shards|-bounded
    * aggregate with map-side partials. The only shuffles are the
    * curation joins, the lang-partitioned packing window, and the
    * tiny manifest agg — nothing new beyond its parts. */
  def assemble(spark: SparkSession, docs: DataFrame,
               shardTokens: Long = 4096L): DataFrame = {
    val admitted = curate(spark, docs).select("doc_id")
    val packed = TextAnalysis.tokenPackBy(docs.join(admitted, "doc_id"),
      "lang", shardTokens)
    packed.groupBy("lang", "shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("lang", "shard_id")
  }

  /** [[curate]] extended with the embedding modality: additionally
    * require the document's embedding to survive semantic dedup
    * (Cluster.semDedup kept = 1). The text-side and embedding-side
    * pipelines run independently (different tables, different
    * shuffles) and meet in ONE final equi-join on the id — the
    * multimodal-fusion shape: per-modality curation stays local to
    * its modality's data, only ids cross over. */
  def curateFull(spark: SparkSession, docs: DataFrame,
                 embeddings: DataFrame,
                 minQualityPpm: Long = 750000L,
                 minEstJaccardPpm: Long = 750000L,
                 minCosPpm: Long = 450000L): DataFrame = {
    val kept = Cluster.semDedup(embeddings, minCosPpm = minCosPpm)
      .where(col("kept") === 1)
      .select(col("vec_id").as("doc_id"), col("cid"))
    curate(spark, docs, minQualityPpm, minEstJaccardPpm)
      .join(kept, "doc_id")
      .select("doc_id", "lang", "source", "n_chars", "quality_ppm", "cid")
      .orderBy("doc_id")
  }

  /** MULTIMODAL pair curation composite (r14, VERDICT r13 #1) — the
    * row a VLM training pipeline actually emits: each document is an
    * (image payload ↔ caption text) PAIR (image from the oriented
    * byte fixture [[Multimodal.syntheticOrientedRasters]] — real PNM
    * containers with EXIF-style rotation, every 13th truncated;
    * caption = the document's text), and the composite curates the
    * PAIR, not each modality alone:
    *   1. image side — decode + orientation-normalize + aHash
    *      ([[Multimodal.imagePhashOriented]]: REAL pixel decode,
    *      corrupt payloads → the −1 DLT row, which DROPS the pair:
    *      a broken image is untrainable regardless of its caption);
    *      visual near-dup pairs via the exact 4×16-bit banded
    *      blocker ([[Dedup.imageNearDup]], 100% recall at d ≤ 3) —
    *      the LARGER doc_id of each pair is an image loser;
    *   2. caption side — quality gate
    *      ([[TextAnalysis.qualityScore]] ≥ `minQualityPpm`) and
    *      syntactic near-dup losers via the AUTO-banded MinHash
    *      blocker ([[Dedup.minhashLshAuto]], the [[curate]]
    *      convention: no hand-tuned banding inside a flagship);
    *   3. pair rule — a pair survives iff NEITHER side lost (the
    *      CLIP-recaptioning-era rule: a duplicate image with a novel
    *      caption still teaches the text encoder nothing once its
    *      twin is in — and vice versa);
    *   4. render — the SFT-style interleaved example: the image as a
    *      dims-tagged placeholder token followed by the caption,
    *      with VISION-TOKEN accounting (n_patches = ⌈w/4⌉·⌈h/4⌉ —
    *      the patch grid a ViT-style encoder bills for the image)
    *      and `loss_start = n_patches` (the caption span is the
    *      loss; image patches are masked — the captioning
    *      objective's [[Assembly.sftRender]] discipline).
    *
    * Scale shape: the decode runs ONCE — the phash table is
    * localCheckpointed, so the banded self-join, the dims
    * projection, and the DLT filter all read the checkpoint, never
    * re-decode (PlanAuditSpec pins zero MapPartitions in the final
    * plan). Each modality's curation shuffles only within its
    * modality (phash band join on 16-bit buckets; MinHash band join
    * on text); the pair rule is doc-keyed anti-joins against two
    * SMALL loser id-sets; the render is row-local. Nothing collects
    * beyond the auto-banding counts. */
  def curateMultimodal(spark: SparkSession, docs: DataFrame,
                       minQualityPpm: Long = 750000L,
                       minEstJaccardPpm: Long = 750000L,
                       maxHamming: Int = 3): DataFrame = {
    implicit val s: SparkSession = spark
    val phash = Multimodal.imagePhashOriented(docs).localCheckpoint(true)
    val okImg = phash.where(col("hash_hi") >= 0)
      .select("doc_id", "width", "height")
    val imgLosers = Dedup.imageNearDup(phash, maxHamming)
      .select(col("doc_b").as("doc_id")).distinct()
    val quality = TextAnalysis.qualityScore(docs)
      .select("doc_id", "quality_ppm")
    val capLosers = Dedup.minhashLshAuto(docs)
      .where(col("est_jaccard_ppm") >= minEstJaccardPpm)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.select("doc_id", "text")
      .join(okImg, "doc_id")
      .join(quality, "doc_id")
      .where(col("quality_ppm") >= minQualityPpm)
      .join(imgLosers, Seq("doc_id"), "left_anti")
      .join(capLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("width"), col("height"),
        expr("((width + 3) div 4) * ((height + 3) div 4)").as("n_patches"),
        size(graft.functions.TextOps.words(col("text"))).cast("long")
          .as("caption_tokens"),
        col("text"))
      .select(col("doc_id"), col("width"), col("height"), col("n_patches"),
        col("caption_tokens"),
        (col("n_patches") + col("caption_tokens")).as("total_tokens"),
        col("n_patches").as("loss_start"),
        concat(lit("<|image:"), col("width").cast("string"), lit("x"),
          col("height").cast("string"), lit("|> "), col("text"))
          .as("rendered"))
      .orderBy("doc_id")
  }

  /** Multimodal ASSEMBLY composite (r14): [[curateMultimodal]]'s
    * survivors packed into context windows and reduced to the shard
    * MANIFEST a VLM training launch consumes — the [[assemble]]
    * discipline with the pair grain's token accounting: a pair costs
    * `total_tokens` = vision patches + caption tokens, so the packer
    * bills the image against the context budget exactly as the
    * model's sequence layout will. Packing is PARTITIONED by
    * language (the tokenPackBy rule: an unpartitioned running-sum
    * window is the tx_pack weak anchor, never a composite's shape);
    * the manifest reports per-(lang, shard) pair count, vision/
    * caption/total token sums and the doc-id range.
    *
    * Plan shape: the curation chain's shuffles + ONE lang-partitioned
    * window + a \|lang × shards\|-bounded map-side-combinable agg;
    * the lang lookup is a doc-keyed join against the narrow source
    * projection. */
  def assembleMultimodal(spark: SparkSession, docs: DataFrame,
                         shardTokens: Long = 4096L): DataFrame = {
    val cur = curateMultimodal(spark, docs)
      .select("doc_id", "n_patches", "caption_tokens", "total_tokens")
    val withLang = cur.join(docs.select("doc_id", "lang"), "doc_id")
    val before = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    withLang
      .withColumn("shard_id",
        floor(coalesce(sum(col("total_tokens")).over(before), lit(0L))
          / shardTokens).cast("long"))
      .groupBy("lang", "shard_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum("n_patches").as("vision_tokens"),
        sum("caption_tokens").as("text_tokens"),
        sum("total_tokens").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("lang", "shard_id")
  }

  /** Dataset-card report (r11): the per-source summary a training-run
    * decision reads before any curation runs — docs, whitespace
    * tokens, exact-duplicate rate, mean quality, language spread and
    * the modal language. One row per source; every statistic is
    * integer/ppm (house rule).
    *
    * Scale shape: ONE corpus scan feeding two source-keyed hash aggs
    * (the stats agg and the (source, lang) mode agg — both map-side
    * combinable) plus the quality chain's row-local features; the
    * distinct-text count aggregates md5(text) (32-char keys), not the
    * text payload, so the distinct shuffle carries digests — the same
    * width at any document length. Output is |sources| rows. */
  def report(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.qualityScore(docs)
      .select("doc_id", "n_tokens", "quality_ppm")
    val base = docs.select("doc_id", "source", "lang", "text")
      .join(q, "doc_id")
    val stats = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tokens").as("n_tokens"),
      countDistinct(md5(col("text"))).as("n_distinct_texts"),
      sum("quality_ppm").as("sum_q"),
      countDistinct(col("lang")).as("n_langs"))
    val topLang = docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("c").desc, col("lang"))))
      .where(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    stats.join(topLang, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_distinct_texts"),
        expr("((n_docs - n_distinct_texts) * 1000000) div n_docs")
          .as("exact_dup_ppm"),
        expr("sum_q div n_docs").as("mean_quality_ppm"),
        col("n_langs"), col("top_lang"))
      .orderBy("source")
  }
}
