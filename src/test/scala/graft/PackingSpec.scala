package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{Dedup, Packing}

/** Sequence packing, PII redaction, Bloom decontamination. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  def docs: DataFrame = spark.read.parquet(s"$sf/documents.parquet")

  // ---- sequence packing ----

  private def globalOffsets(df: DataFrame): Map[Long, Long] = {
    // Single-partition window = the reference running total.
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("off", coalesce(sum("nt").over(w), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("tokenOffsets equals the global running total, any bucketing") {
    val data = (0L until 100L).map(i => (i, (i * 7 + 3) % 29)).toDF("id", "nt")
    val want = globalOffsets(data)
    for (buckets <- Seq(1, 7, 64, 1 << 10)) {
      val got = Packing.tokenOffsets(data, "id", "nt",
        buckets = buckets)
        .select("id", "tok_offset")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"buckets=$buckets")
    }
  }

  test("tokenOffsets: sparse, non-contiguous ids") {
    val data = Seq((5L, 10L), (1000000L, 3L), (99L, 0L), (7L, 1L))
      .toDF("id", "nt")
    val want = globalOffsets(data)
    val got = Packing.tokenOffsets(data, "id", "nt", buckets = 10)
      .select("id", "tok_offset")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("tokenOffsets: sparse 63-bit hashed ids, buckets ≪ id range") {
    // The id shape a real pretraining pipeline uses: content-hash doc
    // ids scattered over [0, 2^60). The old `id div bucketSize`
    // bucketing needed ~2^40 buckets here; quantile cuts bound the
    // bucket count (and the driver cumsum) by construction.
    val ids = (0 until 500).map { i =>
      // deterministic 60-bit spread (golden-ratio multiply, masked)
      (i.toLong * 0x9E3779B97F4A7C15L) & ((1L << 60) - 1)
    }
    assert(ids.distinct.length == ids.length)
    assert(ids.max > (1L << 55)) // genuinely sparse
    val data = ids.zipWithIndex
      .map { case (id, i) => (id, (i * 13 + 1).toLong % 37) }
      .toDF("id", "nt")
    val want = globalOffsets(data)
    for (buckets <- Seq(3, 32, 1 << 16)) {
      val got = Packing.tokenOffsets(data, "id", "nt", buckets = buckets)
        .select("id", "tok_offset")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"buckets=$buckets")
    }
  }

  test("tokenOffsets rejects an unbounded driver cumsum") {
    val data = Seq((1L, 2L)).toDF("id", "nt")
    intercept[IllegalArgumentException] {
      Packing.tokenOffsets(data, "id", "nt", buckets = (1 << 16) + 1)
    }
  }

  test("packSequences spans are consistent and cover the stream") {
    val data = (0L until 50L).map(i => (i, (i * 13 + 1) % 700)).toDF("id", "nt")
    val rows = Packing.packSequences(data, "id", "nt", seqLen = 256,
      buckets = 8)
      .select("id", "nt", "tok_offset", "seq_first", "seq_last", "n_seqs")
      .collect().sortBy(_.getLong(0))
    var expectedOff = 0L
    rows.foreach { r =>
      val (nt, off) = (r.getLong(1), r.getLong(2))
      assert(off == expectedOff)
      expectedOff += nt
      assert(r.getLong(3) == off / 256)
      assert(r.getLong(4) == (off + math.max(nt, 1) - 1) / 256)
      assert(r.getLong(5) == r.getLong(4) - r.getLong(3) + 1)
    }
    // a 700-token doc at seqLen 256 must span 3-4 sequences
    assert(rows.exists(_.getLong(5) >= 3))
  }

  test("packSequences rejects non-positive seqLen") {
    val data = Seq((1L, 2L)).toDF("id", "nt")
    intercept[IllegalArgumentException] {
      Packing.packSequences(data, "id", "nt", seqLen = 0)
    }
  }

  // ---- PII redaction ----

  test("redactPii replaces emails, IPs and phone numbers") {
    val got = Seq(
      "mail a.b-c_d@host.co.uk now",
      "srv 192.168.0.1 up",
      "call 555-123-4567 or 555 123 4567",
      "clean text, no pii 12.5 ok")
      .toDF("t")
      .select(TextFunctions.redactPii(col("t")).as("r"),
        TextFunctions.piiCount(col("t")).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(got(0) == ("mail <EMAIL> now", 1))
    assert(got(1) == ("srv <IP> up", 1))
    assert(got(2) == ("call <PHONE> or <PHONE>", 2))
    assert(got(3) == ("clean text, no pii 12.5 ok", 0))
  }

  // ---- Bloom decontamination ----

  test("decontaminateBloom is bit-identical to exact decontaminate") {
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = Dedup.decontaminateBloom(corpus, bench, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloom == exact)
    assert(exact.nonEmpty)
  }

  test("decontaminateBloom evaluates the benchmark side once") {
    // The shingle set feeds three consumers (count, bloom build,
    // verify join); the cache must make the benchmark scan happen
    // exactly once. Instrument the source with an accumulator that
    // counts row evaluations.
    val acc = spark.sparkContext.longAccumulator("benchEvals")
    val benchRows = docs.filter(col("doc_id") % 97 === 0)
      .select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    val bench = benchRows.toDS()
      .map { t => acc.add(1); t }
      .toDF("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val out = Dedup.decontaminateBloom(corpus, bench, "doc_id", "text", 4)
    out.collect() // runs the verify join (third consumer)
    assert(acc.value == benchRows.length.toLong,
      s"benchmark side evaluated ${acc.value} row-evals for " +
        s"${benchRows.length} rows — expected exactly one pass")
  }

  test("decontaminateBloom plan carries the might_contain prefilter") {
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val plan = Dedup.decontaminateBloom(corpus, bench, "doc_id", "text", 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"))
  }
}
