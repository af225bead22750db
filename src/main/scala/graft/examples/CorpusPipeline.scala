package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, UrlFunctions}
import graft.operators.{CopyInto, Dedup, LanguageModel, Sampling, Warc}

/** The full corpus-curation pipeline end to end on the synthetic
  * documents table — crawl landing to training shards, every stage a
  * real operator of this engine:
  *
  *   1. WET landing zone       (Warc.writeWetShards plays the crawl)
  *   2. COPY INTO ... WARC     (exactly-once ingest, URI-keyed)
  *   3. URL canonicalization + per-domain quota (urlHost + quotaCap)
  *   4. quality gate           (qualityFilterReason)
  *   5. LM scoring band        (trainTrigramModel + lmScore)
  *   6. ExactSubstr span dedup (dedupSpans — duplicated passages cut)
  *   7. document-level near-dup (minhash pairs -> dedupCorpus)
  *   8. token-budget sampling  (sampleByTokenBudget)
  *   9. training shards        (writeShards, mega-shard guard on)
  *
  * Run with: sbt "runMain graft.examples.CorpusPipeline [sfDir]"
  */
object CorpusPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-corpus-pipeline")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files
      .createTempDirectory("graft-corpus-pipeline").toString

    // -- 1. the "crawl": documents as WET shards in a landing zone --
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        concat(lit("HTTP://Site"), col("doc_id") % 7,
          lit(".Example.COM:80/doc/"), col("doc_id"),
          lit("?utm_source=crawl")).as("uri"),
        col("text"), col("doc_id"))
    Warc.writeWetShards(raw.filter(col("doc_id") >= 100), "uri", "text",
      s"$root/landing", numShards = 4, seed = "crawl1")
    println(s"1. landing zone: 4 WET shards, " +
      s"${raw.filter(col("doc_id") >= 100).count()} records")

    // -- 2. exactly-once ingest into a URI-keyed graft table --
    graft.core.PDataset.fromDataFrame(
      raw.filter(col("doc_id") < 100).select("uri", "text"), Seq("uri"))
      .reindex(Seq("uri")).writeParquet(s"$root/docs")
    val r1 = CopyInto.copyInto(spark, s"$root/docs", s"$root/landing", "warc")
    val r2 = CopyInto.copyInto(spark, s"$root/docs", s"$root/landing", "warc")
    println(s"2. COPY INTO WARC: ${r1.rowsLoaded} rows; " +
      s"re-run loaded ${r2.filesLoaded} files (exactly-once)")

    // -- 3. canonical URLs, one quota per domain --
    val docs = spark.read.format("graft").load(s"$root/docs")
      .withColumn("url", UrlFunctions.urlCanon(col("uri")))
      .withColumn("domain", UrlFunctions.urlHost(col("uri")))
    val capped = Sampling.quotaCap(docs, "domain", "uri", maxPerGroup = 60)
    println(s"3. per-domain quota: ${docs.count()} -> ${capped.count()}")

    // -- 4. + 5. quality gates: rule-based, then the LM band --
    val ruled = capped.filter(
      TextFunctions.qualityFilterReason(col("text")) === "ok")
    val model = LanguageModel.trainTrigramModel(ruled, "text", vocab = 4096)
    val scored = ruled.join(
      LanguageModel.lmScore(ruled, "uri", "text", model), "uri")
    val cut = scored.stat.approxQuantile("lm_score", Array(0.9), 0.01)(0)
    val banded = scored.filter(col("lm_score") <= cut)
    println(s"4/5. quality gates: ${capped.count()} -> ${ruled.count()} " +
      s"(rules) -> ${banded.count()} (LM band <= ${"%.2f".format(cut)})")

    // -- 6. duplicated-span removal (ExactSubstr) --
    val spanned = Dedup.dedupSpans(banded, "uri", "text", k = 8)
    val removed = Dedup.spanAudit(banded, "uri", "text", k = 8).count()
    println(s"6. span dedup: $removed duplicated spans cut")

    // -- 7. document-level near-dup --
    val pairs = Dedup.minhashNearDupPairs(
      spanned.withColumnRenamed("uri", "doc_id"), "doc_id", "text")
    val deduped = Dedup.dedupCorpus(
      spanned.withColumnRenamed("uri", "doc_id"), "doc_id", pairs)
    println(s"7. near-dup: ${spanned.count()} -> ${deduped.count()}")

    // -- 8. token budget per source domain --
    val weighted = deduped
      .withColumn("domain", UrlFunctions.urlHost(col("doc_id")))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
    val sampled = Sampling.sampleByTokenBudget(
      weighted, "domain", "doc_id", "n_tokens", budget = 2000L)
    println(s"8. token budget: ${deduped.count()} -> ${sampled.count()}")

    // -- 9. training shards (mega-shard guard on by default) --
    Sampling.writeShards(sampled.select("doc_id", "text"), "doc_id",
      numShards = 4, seed = "epoch0", dir = s"$root/shards")
    val shards = spark.read.parquet(s"$root/shards")
    println(s"9. shards: ${shards.select("shard").distinct().count()} " +
      s"files, ${shards.count()} rows — pipeline complete")
    spark.stop()
  }
}
