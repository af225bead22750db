package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Replays ingestion rounds against a growing corpus, running BOTH
  * dedup paths per round and checking they emit the SAME
  * batch-touching pair set:
  *   - incremental: sign the batch only, equi-join the persisted
  *     band index, verify hits (`Dedup.incrementalNearDupPairs`);
  *   - naive rescan: `minhashNearDupPairs` over (corpus ∪ batch),
  *     filtered to batch-touching pairs afterwards.
  *
  * What the numbers mean: per round the incremental path's work is
  * O(batch) signatures + a bucket join against the index, while the
  * rescan re-signs EVERY corpus document and re-pairs old-vs-old
  * buckets it already paired last round — O(corpus) per round, so
  * O(corpus²/batch) cumulative over an ingestion history. At sf0.1
  * (5k docs, seconds of fixed Spark stage cost) the asymptotics
  * don't dominate yet — the measured contract here is the pair-set
  * EQUALITY plus the flat-per-round incremental trend; the corpus
  * term is what a 100 TB corpus amplifies by six orders.
  *
  * Run with:
  *   sbt "runMain graft.examples.IncrementalIngest [sfDir] [reps]"
  */
object IncrementalIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-incremental-ingest")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").cache()
    val n = docs.count()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // residue 0 seeds the corpus; round r (1..reps) ingests residue r
    // against everything ingested before it
    val idx = java.nio.file.Files.createTempDirectory("graft-mh-")
      .resolve("idx").toString
    var corpusCond = col("doc_id") % (reps + 1) === 0
    Dedup.buildMinhashIndex(spark, docs.filter(corpusCond),
      "doc_id", "text", idx)
    println(s"corpus seeded: ${docs.filter(corpusCond).count()} of $n docs")

    (1 to reps).foreach { r =>
      val batch = docs.filter(col("doc_id") % (reps + 1) === r)
      val corpus = docs.filter(corpusCond)
      val (incPairs, incSec) = time {
        Dedup.incrementalNearDupPairs(spark, batch, "doc_id", "text",
          corpus, idx).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      }
      // the naive path: full pair scan over (corpus ∪ batch),
      // restricted afterwards to batch-touching pairs
      val batchIds = batch.select("doc_id").collect()
        .map(_.getLong(0)).toSet
      val (fullPairs, fullSec) = time {
        Dedup.minhashNearDupPairs(corpus.unionByName(batch),
          "doc_id", "text")
          .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
          .filter(p => batchIds(p._1) || batchIds(p._2))
      }
      require(incPairs == fullPairs,
        s"round $r: incremental and full pair sets diverge")
      val (_, appendSec) = time {
        Dedup.appendToMinhashIndex(spark, batch, "doc_id", "text", idx)
      }
      println(f"round $r: batch=${batchIds.size}%d " +
        f"corpus=${corpus.count()}%d pairs=${incPairs.size}%d " +
        f"incremental=${incSec}%.2fs (+append ${appendSec}%.2fs) " +
        f"full-rescan=${fullSec}%.2fs")
      corpusCond = corpusCond || col("doc_id") % (reps + 1) === r
    }
    // maintenance step of the loop: every appended batch overlapped
    // the whole bucket space — compaction re-sorts the index back to
    // disjoint bucket ranges so equi-join pruning stays sharp; query
    // results are provably unchanged (the differential above would
    // catch any drift on the next run)
    val before = graft.operators.Maintenance.layoutHealth(spark, idx)
    val (_, compactSec) = time {
      Dedup.compactMinhashIndex(spark, idx)
    }
    val after = graft.operators.Maintenance.layoutHealth(spark, idx)
    println(f"index compaction: maxOverlap ${before.maxOverlap}%d -> " +
      f"${after.maxOverlap}%d across ${after.files}%d files " +
      f"in ${compactSec}%.2fs")
    spark.stop()
  }
}
