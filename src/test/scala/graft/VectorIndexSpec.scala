package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, VectorIndex}
import Fixtures._

/** Persisted IVF(-PQ) index: built once, queried many times with NO
  * retraining — queries match the one-shot operators bit-for-bit and
  * the cell-clustered layout prunes unprobed files at plan time. */
class VectorIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 10)

  private lazy val ivfDir: String = {
    val dir = tempDir("vecidx-ivf") + "/idx"
    VectorIndex.build(spark, emb, "vec_id", "embedding", dir,
      dim = 64, nlist = 16, pq = Some((16, 32)))
    dir
  }

  private def countJobs[A](body: => A): (A, Int) = {
    val n = new AtomicInteger
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    val out =
      try body
      finally {
        org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
        spark.sparkContext.removeSparkListener(l)
      }
    (out, n.get)
  }

  test("indexed topK matches the one-shot ivfTopK bit-for-bit") {
    val got = VectorIndex.topK(spark, queries, ivfDir,
      "vec_id", "embedding", k = 5, nprobe = 4)
    val want = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
      k = 5, dim = 64, nlist = 16, nprobe = 4)
    assertSameRows(got, want)
  }

  test("indexed pqTopK matches the one-shot ivfPqTopK bit-for-bit") {
    val got = VectorIndex.pqTopK(spark, queries, ivfDir,
      "vec_id", "embedding", k = 5, nprobe = 4)
    val want = Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding",
      k = 5, dim = 64, nlist = 16, nprobe = 4, m = 16, ksub = 32)
    assertSameRows(got, want)
  }

  test("query batches launch no training job") {
    val dir = ivfDir // force the lazy build OUTSIDE the counted window
    // The trained geometry loads driver-side: ZERO Spark jobs — the
    // one-shot operators' training (bounded sample collect + Lloyd)
    // never reruns against a persisted index.
    val (_, loadJobs) = countJobs(VectorIndex.load(spark, dir))
    assert(loadJobs == 0, s"load must be a driver-side read, saw $loadJobs")
    // And batches are stateless repeats: the Nth batch costs exactly
    // what the 1st did (one distinct-cells collect + the query jobs) —
    // nothing trains, caches or amortizes across calls.
    def batch(lo: Int, hi: Int) = countJobs {
      VectorIndex.topK(spark,
        emb.filter(col("vec_id") >= lo && col("vec_id") < hi),
        dir, "vec_id", "embedding", k = 5, nprobe = 4).collect()
    }._2
    val first = batch(0, 10)
    val second = batch(10, 20)
    assert(second == first,
      s"repeat batches must cost the same jobs: $first then $second")
  }

  test("probing few cells prunes unprobed index files at plan time") {
    val meta = VectorIndex.load(spark, ivfDir)
    assert(meta.nlist == 16 && meta.codebooks.nonEmpty)
    val all = spark.read.format("graft").load(ivfDir)
    val total = scannedFiles(all.select("cell"))
    assert(total >= 3, s"index should span several files, saw $total")
    // one cell -> the sidecar's per-file cell bounds skip the rest
    val one = all.filter(col("cell") === 0).select("cell")
    assert(scannedFiles(one) < total,
      "a single-cell probe must scan fewer files than the full index")
  }

  test("pqTopK demands a PQ-built index") {
    val dir = tempDir("vecidx-nopq") + "/idx"
    VectorIndex.build(spark, emb, "vec_id", "embedding", dir,
      dim = 64, nlist = 8)
    val e = intercept[IllegalArgumentException] {
      VectorIndex.pqTopK(spark, queries, dir, "vec_id", "embedding", k = 5)
    }
    assert(e.getMessage.contains("without PQ"))
  }
}
