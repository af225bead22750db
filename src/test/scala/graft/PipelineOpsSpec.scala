package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions, VectorExpressions}
import graft.operators.{Chunking, Dedup, Events, ImportanceSampling, LanguageModel, Multimodal, Sampling, Similarity}

/** Training-data pipeline operators: dedup family, similarity search,
  * text analysis, events, multimodal plumbing, vec_dot expression. */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  def docs: DataFrame = spark.read.parquet(s"$sf/documents.parquet")
  def emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")

  // ---- chunking / quota cap ----

  test("chunking reassembles the original text and respects bounds") {
    val out = Chunking.chunk(docs, "text", chunkChars = 100, overlap = 20)
      .select("doc_id", "chunk_id", "chunk_start", "chunk")
      .collect()
      .groupBy(_.getLong(0))
    val original = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == original.keySet, "no document may be dropped")
    out.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_.getInt(1))
      // chunk k starts at k*step; stripping the overlap from every
      // chunk after the first reassembles the document exactly
      val rebuilt = sorted.head.getString(3) +
        sorted.tail.map(_.getString(3).drop(20)).mkString
      assert(rebuilt == original(id), s"doc $id reassembly mismatch")
      sorted.foreach { c =>
        assert(c.getString(3).length <= 100)
        assert(c.getInt(2) == c.getInt(1) * 80)
      }
    }
  }

  test("chunking reassembly holds for adversarial strings (unicode, empty, short)") {
    val texts = Seq(
      "", "a", "é", "日本語のテキスト" * 40, "a b  c\nd\te" * 30,
      "🙂🙃" * 25, "x" * 99, "y" * 100, "z" * 101,
      (0 until 300).map(i => ('a' + i % 26).toChar).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // the engine (like SQL substr) counts CODE POINTS; String.drop
    // counts UTF-16 units, so strip overlaps code-point-wise
    def dropCp(s: String, n: Int): String = {
      val cp = s.codePointCount(0, s.length)
      s.substring(s.offsetByCodePoints(0, math.min(n, cp)))
    }
    for ((chunkChars, overlap) <- Seq((100, 20), (7, 3), (1, 0), (50, 49))) {
      val out = Chunking.chunk(df, "text", chunkChars, overlap)
        .select("doc_id", "chunk_id", "chunk")
        .collect().groupBy(_.getLong(0))
      texts.zipWithIndex.foreach { case (t, i) =>
        val chunks = out(i.toLong).sortBy(_.getInt(1)).map(_.getString(2))
        val rebuilt = chunks.head + chunks.tail.map(dropCp(_, overlap)).mkString
        assert(rebuilt == t,
          s"doc $i failed at chunkChars=$chunkChars overlap=$overlap")
      }
    }
  }

  test("quotaCap keeps at most N per group, deterministically") {
    val capped = Sampling.quotaCap(docs, "source", "doc_id", 5)
    val counts = capped.groupBy("source").count().collect()
    assert(counts.forall(_.getLong(1) <= 5))
    // groups under quota pass through whole
    val small = docs.groupBy("source").count()
      .filter(col("count") <= 5).collect().map(_.getString(0)).toSet
    counts.filter(r => small(r.getString(0))).foreach { r =>
      val full = docs.filter(col("source") === r.getString(0)).count()
      assert(r.getLong(1) == full)
    }
    // deterministic: same ids on a different partitioning
    val again = Sampling.quotaCap(docs.repartition(13), "source", "doc_id", 5)
    assert(capped.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("sampleByTokenBudget fills each source in md5 order up to the " +
      "budget; under-budget sources pass whole; deterministic") {
    val B = 7000L // straddles the sf0.001 per-source totals
    val out = Sampling.sampleByTokenBudget(
      docs.select("doc_id", "source", "n_chars"),
      "source", "doc_id", "n_chars", budget = B)
    val got = out.select("doc_id").collect().map(_.getLong(0)).toSet

    // driver-side re-derivation of the operator's exact rule
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def frac(id: Long): Double =
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16)
        .toDouble / 4294967296.0
    val rows = docs.select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
      val tot = rs.map(_._3).sum
      if (tot <= B) rs
      else {
        val rate = math.min(1.0, 2.0 * B / tot)
        val cands = rs.filter(r => frac(r._1) < rate)
          .sortBy(r => (md5hex(r._1.toString), r._1))
        var cum = 0L
        cands.takeWhile { r =>
          val start = cum; cum += r._3; start < B
        }
      }
    }.map(_._1).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // both branches exercised by the fixture
    val totals = rows.groupBy(_._2).map { case (_, rs) => rs.map(_._3).sum }
    assert(totals.exists(_ <= B) && totals.exists(_ > B),
      s"fixture must exercise both branches, totals=$totals")
    // deterministic across partitionings
    val again = Sampling.sampleByTokenBudget(
      docs.select("doc_id", "source", "n_chars").repartition(13),
      "source", "doc_id", "n_chars", budget = B)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got)

    // per-source budget overrides: src0 squeezed to 1000, src1 raised
    // past its total (passes whole), everyone else at the default
    val overrides = Map("src0" -> 1000L, "src1" -> 1000000L)
    val mixed = Sampling.sampleByTokenBudget(
      docs.select("doc_id", "source", "n_chars"),
      "source", "doc_id", "n_chars", budget = B,
      perSource = overrides)
    val mixedW = mixed.groupBy("source").agg(sum("n_chars").as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val srcTotals = rows.groupBy(_._2)
      .map { case (s2, rs) => s2 -> rs.map(_._3).sum }
    assert(mixedW("src1") == srcTotals("src1"),
      "raised budget passes the source whole")
    // squeezed source: fill semantics bound kept weight by
    // budget + the boundary-crossing doc (< budget + max doc weight)
    val maxDoc = rows.filter(_._2 == "src0").map(_._3).max
    assert(mixedW("src0") < 1000L + maxDoc && mixedW("src0") >= 1000L,
      s"src0 kept ${mixedW("src0")}")
  }

  test("sampleByTokenBudget buckets the over-budget fill: no task " +
      "absorbs a source's whole candidate set") {
    // one giant source where EVERY row is a candidate (keepRate 1):
    // a per-source window would prefix-sum all 4096 rows in ONE
    // task — the scale-killer at a real budget; the bucketed fill
    // (256 md5-prefix buckets, Packing.tokenOffsets' shape) caps a
    // task at ~1/256 of the candidate set
    val n = 4096L
    val df = spark.range(n).select(
      col("id").as("doc_id"), lit("web").as("source"),
      lit(1L).as("n_chars"))
    val maxShuffleRead = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val r = te.taskMetrics.shuffleReadMetrics.recordsRead
        maxShuffleRead.getAndUpdate(m => math.max(m, r)); ()
      }
    }
    val sc = spark.sparkContext
    // AQE coalescing legitimately fuses the tiny test buckets back
    // into few tasks — disable it so the pin observes the declared
    // partitioning, which is what holds at scale
    val prev = spark.conf
      .get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    sc.addSparkListener(l)
    try {
      val out = Sampling.sampleByTokenBudget(
        df, "source", "doc_id", "n_chars", budget = 2048L)
      // unit weights: the fill keeps exactly `budget` rows
      assert(out.count() == 2048L)
      org.apache.spark.GraftTestBridge.drainListeners(sc)
      val m = maxShuffleRead.get()
      assert(m > 0, "the fill must involve a shuffle")
      assert(m < n / 4,
        s"a single task absorbed $m of $n candidate rows — the " +
          "prefix sum is not bucketed")
    } finally {
      sc.removeSparkListener(l)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
    }
  }

  test("lmScore: corpus-like text scores low, gibberish scores high; " +
      "every doc scores; deterministic across partitionings") {
    val base = docs.select("doc_id", "text")
    val scored = LanguageModel.lmScoreSelf(base, "doc_id", "text",
      vocab = 2048)
    assert(scored.count() == base.count(),
      "one score row per input document")
    assert(scored.filter(col("lm_score").isNull).count() == 0)

    // the trained model separates corpus-like prose from gibberish
    val model = LanguageModel.trainTrigramModel(base, "text", 2048)
    assert(model.count() <= 2048)
    val probe = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs on"),
      (2L, "zqxj vvkw qqjx xjzp wqkv zzqv xqqw jzxv")).toDF(
      "doc_id", "text")
    val s = LanguageModel.lmScore(probe, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(2L) > s(1L),
      s"gibberish must score above prose: $s")

    // pure function of the corpus: partitioning-independent
    val again = LanguageModel.lmScoreSelf(base.repartition(13),
      "doc_id", "text", vocab = 2048)
    val a = scored.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = again.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b)
  }

  test("dedupCorpusByQuality keeps the best-quality cluster member " +
      "(not the smallest id); singletons untouched") {
    val base = Seq(
      (10L, "same text body here", 1L),
      (11L, "same text body here", 5L),
      (12L, "same text body here", 3L),
      (20L, "a unique document", 9L)).toDF("doc_id", "text", "q")
    val pairs = Seq((10L, 11L), (10L, 12L), (11L, 12L))
      .toDF("idA", "idB")
    val byQuality = Dedup.dedupCorpusByQuality(base, "doc_id", "q", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byQuality == Set(11L, 20L), byQuality.toString)
    // the min-id keeper would have chosen 10 — the policies differ
    val byMinId = Dedup.dedupCorpus(base, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byMinId == Set(10L, 20L), byMinId.toString)
    // quality ties break on the smaller id
    val tied = Dedup.dedupCorpusByQuality(
      base.withColumn("q", lit(7L)), "doc_id", "q", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tied == Set(10L, 20L), tied.toString)
  }

  test("dsirSelect enriches the target domain and is a pure function " +
      "of (corpus, ids)") {
    val raw = docs.select("doc_id", "text", "lang")
    val target = raw.filter(col("lang") === "en")
    val sel = ImportanceSampling.dsirSelect(raw, target,
      "doc_id", "text", k = 100, vocab = 2048)
    val selIds = sel.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(selIds.size == 100)
    // the selection must be strongly enriched in the target domain:
    // non-English documents' trigrams miss the target model entirely,
    // so their importance weights sit far below any English doc's
    val enAll = target.count().toDouble / raw.count()
    val enSel = raw.filter(col("lang") === "en")
      .filter(col("doc_id").isInCollection(selIds.toSeq))
      .count().toDouble / selIds.size
    assert(enSel > enAll + 0.2,
      f"selected en fraction $enSel%.2f vs corpus $enAll%.2f")
    // deterministic: same ids on a different partitioning
    val again = ImportanceSampling.dsirSelect(raw.repartition(13),
      target, "doc_id", "text", k = 100, vocab = 2048)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == selIds)
    // importance is the rounded log-weight, not the noised key:
    // every selected doc carries a finite value
    assert(sel.filter(col("importance").isNull).count() == 0)
  }

  test("mixtureByTemperature flattens toward the smallest source") {
    val natural = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nmin = natural.values.min
    val smallest = natural.minBy(_._2)._1

    // alpha = 1: the natural mix, untouched.
    assert(Sampling.mixtureByTemperature(docs, "source", "doc_id", 1.0)
      .count() == docs.count())

    // alpha = 0: every source equalizes toward n_min; the smallest
    // keeps everything (fraction exactly 1).
    val flat = Sampling.mixtureByTemperature(docs, "source", "doc_id", 0.0)
    val flatCounts = flat.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flatCounts(smallest) == nmin)
    flatCounts.foreach { case (src, n) =>
      val expect = nmin.toDouble
      assert(math.abs(n - expect) <= 6 * math.sqrt(expect) + 1,
        s"$src kept $n, expected ~$expect of ${natural(src)}")
    }

    // alpha ordering: hotter (smaller alpha) never keeps more.
    val half = Sampling.mixtureByTemperature(docs, "source", "doc_id", 0.5)
    val halfCounts = half.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    halfCounts.foreach { case (src, n) =>
      assert(n >= flatCounts.getOrElse(src, 0L) && n <= natural(src))
    }

    // kept set is a pure function of ids: partitioning-independent
    val again = Sampling.mixtureByTemperature(
      docs.repartition(13), "source", "doc_id", 0.5)
    assert(half.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("shardAssign is a deterministic permutation into dense shards") {
    val n = docs.count()
    val sharded = Sampling.shardAssign(docs, "doc_id", 8, "epoch1")
    val rows = sharded.select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == n)
    assert(rows.forall { case (_, s, _) => s >= 0 && s < 8 })
    // positions within a shard are exactly 1..count — no gaps, no ties
    rows.groupBy(_._2).foreach { case (s, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq,
        s"shard $s positions not dense")
    }
    // reruns and repartitionings reproduce the identical assignment
    val again = Sampling.shardAssign(docs.repartition(13), "doc_id", 8,
      "epoch1").select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a new seed is a genuinely different shuffle
    val other = Sampling.shardAssign(docs, "doc_id", 8, "epoch2")
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val moved = rows.count { case (id, s, _) => other(id) != s }
    assert(moved > n / 2, s"only $moved of $n docs moved shard on reseed")
  }

  test("splitAssign covers every row, stable across runs, redrawn by seed") {
    val splits = Seq("train" -> 0.75, "valid" -> 0.125, "test" -> 0.125)
    val assigned = Sampling.splitAssign(docs, "doc_id", splits, "s1")
    val byName = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(byName.values.sum == n, "every row lands in exactly one split")
    assert(byName.keySet.subsetOf(Set("train", "valid", "test")))
    // realized sizes concentrate on the weights
    assert(math.abs(byName("train") - 0.75 * n) <= 6 * math.sqrt(n) + 1)
    // membership is partitioning-independent
    val again = Sampling.splitAssign(docs.repartition(13), "doc_id",
      splits, "s1").select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assigned.select("doc_id", "split").collect().foreach { r =>
      assert(again(r.getLong(0)) == r.getString(1))
    }
    // a new seed is a genuinely different draw
    val other = Sampling.splitAssign(docs, "doc_id", splits, "s2")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = assigned.select("doc_id", "split").collect()
      .count(r => other(r.getLong(0)) != r.getString(1))
    assert(moved > n / 10, s"only $moved of $n rows moved on reseed")
  }

  test("writeShards lands one ordered file per shard, reproducibly") {
    val dir = Fixtures.tempDir("shards-out") + "/shards"
    Sampling.writeShards(docs, "doc_id", 4, "epoch1", dir)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 4)
    shardDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${d.getName} must hold exactly one shard file")
    }
    // reading a shard file directly yields rows already in shard_pos
    // order (the order a training loader consumes)
    val s0 = spark.read.parquet(s"$dir/shard=0")
    val pos = s0.select("shard_pos").collect().map(_.getLong(0))
    assert(pos.toSeq == pos.sorted.toSeq && pos.head == 1L)
    // nothing lost, nothing duplicated
    val all = spark.read.parquet(dir)
    assert(all.count() == docs.count())
    assert(all.select("doc_id").distinct().count() == docs.count())
    // the assignment on disk is exactly shardAssign's
    val assigned = Sampling.shardAssign(docs, "doc_id", 4, "epoch1")
      .select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val onDisk = all.select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(onDisk == assigned)
  }

  test("writeShards mega-shard guard: an under-sized numShards fails " +
      "loudly with the offending shard and a suggested numShards, " +
      "before any data is written") {
    val dir = Fixtures.tempDir("shards-guard") + "/shards"
    // 500 docs into 2 shards with a 100-row bound: ~250 rows/shard
    val e = intercept[IllegalArgumentException] {
      Sampling.writeShards(docs, "doc_id", 2, "epoch1", dir,
        maxShardRows = 100)
    }
    assert(e.getMessage.contains("maxShardRows=100"), e.getMessage)
    // suggested numShards = ceil(500 / 100) = 5
    assert(e.getMessage.contains("numShards >= 5"), e.getMessage)
    assert(!new java.io.File(dir).exists(), "nothing may be written")
    // opt-out writes the offending layout deliberately
    Sampling.writeShards(docs, "doc_id", 2, "epoch1", dir,
      maxShardRows = 0)
    assert(spark.read.parquet(dir).count() == docs.count())
  }

  // ---- URL utilities ----

  test("urlCanon/urlHost: the canonicalization contract on edge cases") {
    import spark.implicits._
    import graft.functions.UrlFunctions
    val cases = Seq(
      // lowercase scheme+host, userinfo+default port+fragment+tracking
      ("HTTP://U:P@WWW.Ex.COM:80/P?utm_source=a&x=1&fbclid=2#f",
        "www.ex.com", "http://www.ex.com/P?x=1"),
      ("https://A.org:443/", "a.org", "https://a.org/"),
      ("https://a.org:8443/k?gclid=1", "a.org", "https://a.org:8443/k"),
      // empty path normalizes to /; query straight after authority
      ("http://b.com", "b.com", "http://b.com/"),
      ("http://b.com?a=1&utm_x&b=2", "b.com", "http://b.com/?a=1&b=2"),
      // param ORDER and encoding preserved; names merely containing
      // "utm_" (not as the full prefix) survive
      ("http://c.net/p?zz=9&myutm_x=1&a=%20b", "c.net",
        "http://c.net/p?zz=9&myutm_x=1&a=%20b"),
      // no scheme: canon is identity, host is NULL
      ("not a url", null, "not a url"),
      ("", null, ""))
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), UrlFunctions.urlHost(col("url")).as("h"),
        UrlFunctions.urlCanon(col("url")).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == cases)
  }

  test("urlHost composes with quotaCap: at most N docs per domain") {
    import spark.implicits._
    import graft.functions.UrlFunctions
    val urls = (0L until 60L).map(i =>
      (i, s"https://Host${i % 3}.com/page/$i?utm_medium=x"))
      .toDF("doc_id", "url")
      .withColumn("domain", UrlFunctions.urlHost(col("url")))
    val capped = Sampling.quotaCap(urls, "domain", "doc_id", 5)
    val byDomain = capped.groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain.keySet == Set("host0.com", "host1.com", "host2.com"))
    assert(byDomain.values.forall(_ == 5L), byDomain.toString)
    // deterministic: the same cap re-run keeps the same ids
    val a = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.quotaCap(urls, "domain", "doc_id", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  // ---- vec_dot custom expression ----

  test("vec_dot matches the higher-order-function fold bit-for-bit") {
    val hof = emb.select(
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d"))
      .collect().map(_.getDouble(0))
    val native = emb.select(
      VectorExpressions.vecDot(col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0))
    hof.zip(native).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(b))
    }
  }

  test("vec_dot handles nulls and length mismatches") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(1.0f), Array(2.0f, 9.0f))).toDF("a", "b")
    val got = df.select(VectorExpressions.vecDot(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(32.0, 2.0))
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(Row(null, Seq(1.0f))),
      StructType(Seq(
        StructField("a", ArrayType(FloatType)),
        StructField("b", ArrayType(FloatType)))))
    assert(withNull.select(VectorExpressions.vecDot(col("a"), col("b")))
      .collect()(0).isNullAt(0))
  }

  test("vec_dot generates valid code for every numeric element type") {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    // GenerateMutableProjection throws on invalid generated Java (no
    // silent interpreted fallback), so this proves each typed accessor
    // compiles — the old getAs-based branch failed janino for int/long.
    def dot(a: Expression, b: Expression): Double =
      GraftBridge.compileAndEval(graft.functions.FloatVecDot(a, b))
        .asInstanceOf[Double]
    assert(dot(Literal.create(Array(1, 2, 3)), Literal.create(Array(4, 5, 6))) == 32.0)
    assert(dot(Literal.create(Array(1L, 2L)), Literal.create(Array(3L, 4L))) == 11.0)
    assert(dot(Literal.create(Array[Short](1, 2)),
      Literal.create(Array[Short](2, 2))) == 6.0)
    assert(dot(Literal.create(Seq(1.toByte)), Literal.create(Seq(5.toByte))) == 5.0)
    assert(dot(Literal.create(Array(BigDecimal(1.5), BigDecimal(2.0))),
      Literal.create(Array(BigDecimal(2.0), BigDecimal(3.0)))) == 9.0)
    assert(dot(Literal.create(Array(1.5f, 2f)), Literal.create(Array(2f, 1f))) == 5.0)
    assert(dot(Literal.create(Array(1.5, 2.0)), Literal.create(Array(2.0, 1.0))) == 5.0)
  }

  test("string_array_hash64 kernel matches the HOF hash trees bit-for-bit") {
    val sh = TextFunctions.wordShingles(col("text"), 3)
    val tk = TextFunctions.tokens(lower(col("text")))
    val rows = docs.limit(50).select(
      Dedup.shingleHashes(sh).as("k_xx"),
      transform(sh, s => xxhash64(s).bitwiseAND(lit(0xFFFFFFFFL))).as("h_xx"),
      Dedup.tokenHashes(col("text")).as("k_md5"),
      transform(tk, t => Dedup.md5Hash64(t)).as("h_md5"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "xxh64_32 mismatch")
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), "md5_64 mismatch")
    }
  }

  // ---- dedup family ----

  test("minhash LSH finds exactly the exhaustive jaccard pairs") {
    val exhaustive = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .orderBy("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1)))
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text")
      .orderBy("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exhaustive.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh.toSeq == exhaustive.toSeq)
  }

  test("minhash signature similarity tracks jaccard") {
    val sh = docs.limit(50).select(col("doc_id"),
      TextFunctions.wordShingles(col("text"), 3).as("sh"))
      .withColumn("h", Dedup.shingleHashes(col("sh")))
      .withColumn("sig", Dedup.minhashSignature(col("h"), 126))
    val rows = sh.select("doc_id", "sh", "sig").collect()
    val byId = rows.map(r => (r.getLong(0),
      (r.getSeq[String](1).toSet, r.getSeq[Long](2)))).toMap
    for (Seq(x, y) <- byId.keys.toSeq.sorted.take(6).combinations(2)) {
      val (shx, sigx) = byId(x); val (shy, sigy) = byId(y)
      val jac = shx.intersect(shy).size.toDouble / shx.union(shy).size
      val est = sigx.zip(sigy).count { case (a, b) => a == b } / 126.0
      assert(math.abs(jac - est) < 0.25, s"pair ($x,$y): jac=$jac est=$est")
    }
  }

  test("exact dedup keys by content hash") {
    val doubled = docs.select(col("doc_id"), col("text"))
      .union(docs.select(col("doc_id") + 1000000, col("text")))
    val out = Dedup.exactDedup(doubled, "doc_id", "text")
    assert(out.count() == docs.count()) // every text now has 2 copies
    assert(out.agg(sum("copies")).collect()(0).getLong(0) == 2 * docs.count())
  }

  test("decontaminate counts distinct shared n-grams, clamps short docs") {
    val corpus = Seq(
      (1L, "x a b c d e y"), // contains "a b c d e" only
      (2L, "no overlap here at all whatsoever"),
      (3L, "a b c d e f g"), // "a b c d e" and "b c d e f"
      (4L, "a b")) // shorter than n: one clamped shingle
      .toDF("doc_id", "text")
    val bench = Seq("a b c d e f", "a b").toDF("text")
      .withColumn("doc_id", lit(0L))
    val out = Dedup.decontaminate(corpus, bench, "doc_id", "text",
      shingleWords = 5)
    assert(out.orderBy("doc_id").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 1L), (3L, 2L), (4L, 1L)))
    // the benchmark shingle set must be the BROADCAST side
    val hasBroadcast = out.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin")
    assert(hasBroadcast, "benchmark shingles should broadcast")
  }

  test("repetitionStats: hand-computed fractions, edge cases") {
    def stats(t: String): (Double, Double, Double) = {
      val r = Seq(t).toDF("t")
        .select(TextFunctions.repetitionStats(col("t"), 2).as("r"))
        .collect().head.getSeq[Double](0)
      (r(0), r(1), r(2))
    }
    // lines: "a b","a b","c" -> dup chars 6 of 7; bigrams of
    // [a,b,a,b,c]: "a b","b a","a b","b c" -> top 2/4, dup (4-3)/4
    assert(stats("a b\na b\nc") == (6.0 / 7.0, 0.5, 0.25))
    // no repetition anywhere
    assert(stats("x y z") == (0.0, 1.0 / 2.0, 0.0))
    // empty text: one empty line (0 chars), one empty token-gram
    assert(stats("") == (0.0, 1.0, 0.0))
    // char-weighting uses code points (multi-byte chars count once)
    assert(stats("ééé\nééé\nz")._1 == 6.0 / 7.0)
    // interpreted and codegen paths agree on real docs
    val onDocs = docs.limit(50)
      .select(TextFunctions.repetitionStats(col("text"), 3).as("r"))
      .collect()
    assert(onDocs.forall { row =>
      val r = row.getSeq[Double](0)
      r.forall(v => v >= 0.0 && v <= 1.0)
    })
    // the aliased kernel must survive as ONE evaluation — CollapseProject
    // must not inline a non-cheap alias into its three extractions
    val plan = docs
      .withColumn("__r", TextFunctions.repetitionStats(col("text"), 3))
      .select(col("doc_id"),
        col("__r").getItem(0).as("a"),
        col("__r").getItem(1).as("b"),
        col("__r").getItem(2).as("c"))
      .queryExecution.optimizedPlan.toString
    assert(plan.sliding("repetition_stats".length).count(
      _ == "repetition_stats") == 1, plan)
  }

  test("simhash hamming distance small for near-dups, large for others") {
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDist = 6)
    val nd = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.9)
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = pairs.select("idA", "idB").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // most very-near dups should be within hamming 6 of each other
    assert(nd.nonEmpty && (nd & found).size >= nd.size / 2,
      s"simhash found ${(nd & found).size} of ${nd.size} strong pairs")
  }

  test("LSH-bucketed embedding dedup matches the exhaustive pair scan") {
    // Plant near-dups: a scaled copy of each vector has cosine exactly 1
    // with its original; random cross pairs stay near-orthogonal.
    val base = emb.filter(col("vec_id") < 100).select("vec_id", "embedding")
    val perturbed = base.select((col("vec_id") + 1000).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
    val all = base.unionByName(perturbed)
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = pairs(
      Dedup.embeddingNearDupPairsBrute(all, "vec_id", "embedding", 0.9))
    val lsh = pairs(
      Dedup.embeddingNearDupPairs(all, "vec_id", "embedding", 0.9))
    assert(brute.size >= 100, s"expected >=100 planted pairs, got ${brute.size}")
    assert(lsh == brute,
      s"missed: ${(brute -- lsh).take(5)}; extra: ${(lsh -- brute).take(5)}")
  }

  test("incremental MinHash index: batch-vs-corpus pairs equal the " +
      "full pair scan restricted to the batch, and appends make " +
      "ingestion cumulative") {
    val dir = Fixtures.tempDir("mh-index") + "/idx"
    val old = docs.filter(col("doc_id") < 400)
    // the batch: exact copies of 10 corpus docs (guaranteed cross
    // pairs at jaccard 1.0) plus genuinely new documents
    val copies = old.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 10000)
    val batch = copies.unionByName(
      docs.filter(col("doc_id") >= 400)
        .withColumn("doc_id", col("doc_id") + 20000))
    Dedup.buildMinhashIndex(spark, old, "doc_id", "text", dir)
    def pairSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inc = pairSet(Dedup.incrementalNearDupPairs(
      spark, batch, "doc_id", "text", old, dir))
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val full = pairSet(Dedup.minhashNearDupPairs(
      old.unionByName(batch), "doc_id", "text"))
      .filter(p => batchIds(p._1) || batchIds(p._2))
    assert(inc == full,
      s"missing=${(full -- inc).take(5)} extra=${(inc -- full).take(5)}")
    assert((0L until 10L).forall(i => inc.contains((i, i + 10000, 1.0))))
    // the ingestion decision: corpus copies lose to the corpus, and
    // batch-internal pairs lose their larger id — survivors equal the
    // policy recomputed over the verified pair set
    val losers = inc.map { case (a, b, _) =>
      if (batchIds(a) && batchIds(b)) b else if (batchIds(a)) a else b
    }
    val survivors = Dedup.dedupBatch(
      spark, batch, "doc_id", "text", old, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == batchIds -- losers)
    assert((0L until 10L).forall(i => !survivors(i + 10000)),
      "an exact corpus copy survived ingestion")
    // append the batch; a second batch of the same copies now pairs
    // with BOTH the original corpus doc and the appended copy
    Dedup.appendToMinhashIndex(spark, batch, "doc_id", "text", dir)
    val batch2 = copies.withColumn("doc_id", col("doc_id") + 20000)
    val inc2 = pairSet(Dedup.incrementalNearDupPairs(
      spark, batch2, "doc_id", "text", old.unionByName(batch), dir))
    (0L until 10L).foreach { i =>
      assert(inc2.contains((i, i + 30000, 1.0)), s"missing old pair $i")
      assert(inc2.contains((i + 10000, i + 30000, 1.0)),
        s"missing appended pair $i")
    }
    // a different shingler than the build's refuses loudly — silently
    // disjoint buckets would find zero pairs
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDupPairs(spark, batch2, "doc_id", "text",
        old, dir, shingler = TextFunctions.wordShingles(_, 5),
        shinglerTag = "word-5")
    }
    assert(e.getMessage.contains("shingler"), e.getMessage)
  }

  test("dedupBatch completes with broadcasts disabled — the hit-doc " +
      "semi join is AQE-sized, not hint-forced") {
    // the 100 TB guard: a batch landing in a hot bucket can inflate
    // the hit set past memory; nothing in the path may FORCE a
    // broadcast (AQE's runtime size check must stay in charge)
    val dir = Fixtures.tempDir("mh-nobc") + "/idx"
    val old = docs.filter(col("doc_id") < 300)
    Dedup.buildMinhashIndex(spark, old, "doc_id", "text", dir)
    val batch = old.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 10000)
      .unionByName(docs.filter(col("doc_id") >= 450)
        .withColumn("doc_id", col("doc_id") + 20000))
    val expected = Dedup.dedupBatch(spark, batch, "doc_id", "text",
      old, dir).select("doc_id").collect().map(_.getLong(0)).toSet
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val q = Dedup.dedupBatch(spark, batch, "doc_id", "text", old, dir)
      val got = q.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expected, "shuffle path must match the broadcast path")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevA match {
        case Some(v) =>
          conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("compactMinhashIndex: query results unchanged, layout back to " +
      "disjoint bucket ranges, params sidecar survives") {
    val dir = Fixtures.tempDir("mh-compact") + "/idx"
    val old = docs.filter(col("doc_id") < 300)
    Dedup.buildMinhashIndex(spark, old, "doc_id", "text", dir)
    // two overlapping appends (each batch's bucket range spans the
    // whole hash space, so the index layout degrades)
    val b1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
      .withColumn("doc_id", col("doc_id") + 10000)
    val b2 = docs.filter(col("doc_id") >= 400)
      .withColumn("doc_id", col("doc_id") + 20000)
    Dedup.appendToMinhashIndex(spark, b1, "doc_id", "text", dir)
    Dedup.appendToMinhashIndex(spark, b2, "doc_id", "text", dir)
    assert(!graft.core.PDataset.scanParquet(spark, dir).isDisjoint,
      "appends must overlap for the fixture to mean anything")
    val corpus = old.unionByName(b1).unionByName(b2)
    val probe = old.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 90000)
    def pairs() = Dedup.incrementalNearDupPairs(
      spark, probe, "doc_id", "text", corpus, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = pairs()
    assert(before.nonEmpty)
    Dedup.compactMinhashIndex(spark, dir)
    assert(graft.core.PDataset.scanParquet(spark, dir).isDisjoint,
      "compaction must restore disjoint bucket ranges")
    assert(pairs() == before, "compaction changed query results")
    assert(Dedup.storedShinglerTag(spark, dir) == Dedup.WordTrigramTag)
    // a non-index table refuses
    val plain = Fixtures.tempDir("mh-compact-plain") + "/t"
    graft.core.PDataset.fromDataFrame(
      docs.limit(5), Seq("doc_id")).writeParquet(plain)
    val e = intercept[IllegalArgumentException] {
      Dedup.compactMinhashIndex(spark, plain)
    }
    assert(e.getMessage.contains("MinHash"), e.getMessage)
  }

  test("segment dedup drops corpus-frequent lines, preserves order, " +
      "keeps empty segments, and drops emptied documents") {
    import spark.implicits._
    val docs = Seq(
      (1L, "HEADER\nalpha\nMID\nbeta\nFOOTER"),
      (2L, "HEADER\ngamma\nMID\n\ndelta\nFOOTER"),
      (3L, "HEADER\nepsilon\nFOOTER"),
      (4L, "HEADER\nFOOTER"), // all boilerplate: drops entirely
      (5L, "zeta\nHEADER")    // boilerplate not at the start
    ).toDF("doc_id", "text")
    // HEADER/FOOTER/MID hit 5/4/2 docs; threshold 1 drops all three
    val out = Dedup.dedupSegments(docs, "doc_id", "text", maxDocFreq = 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(
      (1L, "alpha\nbeta"),
      (2L, "gamma\n\ndelta"), // the unique empty segment survives
      (3L, "epsilon"),
      (5L, "zeta")))
  }

  test("segment dedup: NULL text coalesces to the empty string — the " +
      "document survives (as empty) unless the empty segment itself " +
      "is boilerplate") {
    val docs = Seq(
      (1L, "alpha"), (2L, null), (3L, "beta")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs, "doc_id", "text", maxDocFreq = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "alpha"), (2L, ""), (3L, "beta")))
    // ...and when the empty segment IS corpus-frequent, null-text docs
    // drop by the same rule as any all-boilerplate document.
    val many = Seq((1L, null), (2L, null), (3L, null), (4L, "solo"))
      .map { case (i, t) => (i.toLong, t) }.toDF("doc_id", "text")
    val kept = Dedup.dedupSegments(many, "doc_id", "text", maxDocFreq = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(4L))
  }

  // ---- ExactSubstr span dedup ----

  private val SpanPassage =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"

  private def plantedDocs: DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" " + SpanPassage)))
        .otherwise(col("text")).as("text"))

  /** Driver-side ExactSubstr reference: tokenize on {' ','\t','\n',
    * '\r'}, k-token shingles keyed by the joined token string, df >= 2
    * distinct docs, (optionally) exempt the min-(id, start) keeper,
    * merge overlapping/adjacent hits. ASCII fixtures: char == cp. */
  private def bruteSpans(
      texts: Map[Long, String], k: Int, keepFirst: Boolean,
      withinDoc: Boolean = false): Map[Long, Seq[(Int, Int)]] = {
    val ws = " \t\n\r"
    def toks(t: String): IndexedSeq[(String, Int, Int)] = {
      val buf = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
      var i = 0
      while (i < t.length) {
        if (!ws.contains(t(i))) {
          val s = i
          while (i < t.length && !ws.contains(t(i))) i += 1
          buf += ((t.substring(s, i), s, i))
        } else i += 1
      }
      buf.toIndexedSeq
    }
    val occ = scala.collection.mutable.Map[String,
      scala.collection.mutable.ArrayBuffer[(Long, Int, Int)]]()
    for ((id, t) <- texts; tk = toks(t); i <- 0 to tk.length - k) {
      val key = (i until i + k).map(tk(_)._1).mkString(" ")
      occ.getOrElseUpdate(key,
        scala.collection.mutable.ArrayBuffer()) +=
        ((id, tk(i)._2, tk(i + k - 1)._3))
    }
    val hits = scala.collection.mutable.Map[Long,
      scala.collection.mutable.ArrayBuffer[(Int, Int)]]()
    if (withinDoc) {
      for ((_, os) <- occ; (_, docOs) <- os.groupBy(_._1)
           if docOs.size >= 2) {
        val keep = docOs.minBy(_._2)
        for (o <- docOs if !(keepFirst && o._2 == keep._2))
          hits.getOrElseUpdate(o._1,
            scala.collection.mutable.ArrayBuffer()) += ((o._2, o._3))
      }
    } else {
      for ((_, os) <- occ if os.map(_._1).distinct.size >= 2) {
        val keep = os.minBy(o => (o._1, o._2))
        for (o <- os if !(keepFirst && o._1 == keep._1 && o._2 == keep._2))
          hits.getOrElseUpdate(o._1,
            scala.collection.mutable.ArrayBuffer()) += ((o._2, o._3))
      }
    }
    hits.map { case (id, sp) =>
      val merged = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      for ((s, e) <- sp.sorted) {
        if (merged.nonEmpty && s <= merged.last._2)
          merged(merged.length - 1) =
            (merged.last._1, math.max(merged.last._2, e))
        else merged += ((s, e))
      }
      id -> merged.toSeq
    }.toMap
  }

  private def excise(t: String, spans: Seq[(Int, Int)]): String = {
    val sb = new StringBuilder
    var p = 0
    for ((s, e) <- spans) { sb.append(t.substring(p, s)); p = e }
    sb.append(t.substring(p)).toString
  }

  test("token_span_shingles kernel: code-point offsets, 4-char ws set, " +
      "md5-prefix hashes, short-text empty array") {
    import spark.implicits._
    // "𝄞" is one code point, two UTF-16 chars: offsets must count
    // code points (SQL substr units), not Java chars
    val rows = Seq(
      "a\tb  c\nd",        // mixed whitespace, runs collapse
      " lead trail ",      // leading/trailing ws
      "𝄞x yé z",           // surrogate pair + accent
      "one two",           // exactly k tokens
      "solo",              // fewer than k: empty
      ""                   // empty text
    ).toDF("t")
    val got = rows.select(
      graft.functions.SketchExpressions.tokenSpanShingles(col("t"), 2)
        .as("sh"))
      .collect()
      .map(_.getSeq[Row](0).map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2))))
    def h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 2
    }
    assert(got(0) == Seq((h("a b"), 0, 3), (h("b c"), 2, 6),
      (h("c d"), 5, 8)))
    assert(got(1) == Seq((h("lead trail"), 1, 11)))
    // cp offsets: 𝄞x=[0,2) yé=[3,5) z=[6,7)
    assert(got(2) == Seq((h("𝄞x yé"), 0, 5), (h("yé z"), 3, 7)))
    assert(got(3) == Seq((h("one two"), 0, 7)))
    assert(got(4).isEmpty && got(5).isEmpty)
    // the substr(s+1, e-s) extraction the cut path relies on: code-
    // point offsets really do address the original string
    val back = Seq(("𝄞x yé z", 0, 5), ("𝄞x yé z", 3, 7)).toDF("t", "s", "e")
      .select(col("t").substr(col("s") + lit(1), col("e") - col("s")))
      .collect().map(_.getString(0))
    assert(back.toSeq == Seq("𝄞x yé", "yé z"))
  }

  test("dedupSpans matches a brute-force ExactSubstr reference on the " +
      "planted corpus; the audit rows reconstruct what was cut") {
    val planted = plantedDocs
    val orig = planted.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = bruteSpans(orig, k = 8, keepFirst = true)
    assert(want.nonEmpty, "the planted passage must duplicate")

    val gotSpans = Dedup.duplicatedSpans(planted, "doc_id", "text", k = 8)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getInt(1), r.getInt(2))).sorted.toSeq
      }
    assert(gotSpans == want.filter(_._2.nonEmpty))

    val gotCut = Dedup.dedupSpans(planted, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotCut.keySet == orig.keySet, "every row survives")
    orig.foreach { case (id, t) =>
      assert(gotCut(id) == excise(t, want.getOrElse(id, Nil)),
        s"doc $id cut mismatch")
    }
    // exactly one copy of the passage survives corpus-wide: the
    // smallest planted id keeps it, every other planted doc loses it
    val plantedIds = orig.keySet.filter(_ % 7 == 0)
    val keeper = plantedIds.min
    assert(gotCut(keeper).contains(SpanPassage))
    (plantedIds - keeper).foreach(id =>
      assert(!gotCut(id).contains(SpanPassage), s"doc $id kept a copy"))

    // audit: every row is the exact excised substring; cut + audit
    // reconstruct the original text
    val audit = Dedup.spanAudit(planted, "doc_id", "text", k = 8)
      .collect()
    audit.foreach { r =>
      val (id, s, e) = (r.getLong(0), r.getInt(1), r.getInt(2))
      assert(r.getString(3) == orig(id).substring(s, e),
        s"audit substring mismatch for doc $id [$s,$e)")
    }
    val auditByDoc = audit.groupBy(_.getLong(0))
    orig.foreach { case (id, t) =>
      val spans = auditByDoc.get(id).toSeq.flatten
        .map(r => (r.getInt(1), r.getInt(2), r.getString(3))).sorted
      // reconstruction from the CUT text: splice each removed span
      // back in at its original offset — survivors ∪ audit rebuild
      // the document exactly
      val cutText = gotCut(id)
      val rebuilt = {
        val parts = scala.collection.mutable.ArrayBuffer[String]()
        var origPos = 0
        var cutPos = 0
        for ((s, e, removed) <- spans) {
          parts += cutText.substring(cutPos, cutPos + (s - origPos))
          parts += removed
          cutPos += s - origPos
          origPos = e
        }
        parts += cutText.substring(cutPos)
        parts.mkString
      }
      assert(rebuilt == t, s"doc $id: cut ∪ audit must rebuild original")
    }
  }

  test("dedupSpans keepFirst=false cuts every occurrence; minDocFreq " +
      "above the duplication degree cuts nothing") {
    import spark.implicits._
    val p = "p1 p2 p3 p4 p5 p6 p7 p8 p9"
    val df = Seq(
      (1L, s"one two $p end"),
      (2L, s"zz $p yy"),
      (3L, "nothing shared here at all truly unique words")
    ).toDF("doc_id", "text")
    val both = Dedup.dedupSpans(df, "doc_id", "text", k = 8,
      keepFirst = false)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(both.toSeq == Seq(
      (1L, "one two  end"),
      (2L, "zz  yy"),
      (3L, "nothing shared here at all truly unique words")))
    val first = Dedup.dedupSpans(df, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(first.toSeq == Seq(
      (1L, s"one two $p end"), // min id keeps the only surviving copy
      (2L, "zz  yy"),
      (3L, "nothing shared here at all truly unique words")))
    val none = Dedup.dedupSpans(df, "doc_id", "text", k = 8,
      minDocFreq = 3)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(none.toSeq == df.orderBy("doc_id").collect().map(_.getString(1)).toSeq)
  }

  test("span dedup fuzz: randomized low-vocab corpora (dense shingle " +
      "collisions, overlapping spans) match the brute-force reference " +
      "across cross-doc/within-doc and both keep policies") {
    import spark.implicits._
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg",
      "hh", "ii", "jj")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val texts = (0L until 30L).map { i =>
        i -> (0 until (10 + rnd.nextInt(40)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }.toMap
      val df = texts.toSeq.toDF("doc_id", "text")
      for (wd <- Seq(false, true); kf <- Seq(true, false)) {
        val tag = s"seed=$seed withinDoc=$wd keepFirst=$kf"
        val want = bruteSpans(texts, k = 3, keepFirst = kf,
          withinDoc = wd).filter(_._2.nonEmpty)
        val got = Dedup.duplicatedSpans(df, "doc_id", "text", k = 3,
          keepFirst = kf, withinDoc = wd)
          .collect().groupBy(_.getLong(0))
          .map { case (id, rs) =>
            id -> rs.map(r => (r.getInt(1), r.getInt(2))).sorted.toSeq
          }
        assert(got == want, s"$tag: spans diverge")
        val cut = Dedup.dedupSpans(df, "doc_id", "text", k = 3,
          keepFirst = kf, withinDoc = wd)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        texts.foreach { case (id, t) =>
          assert(cut(id) == excise(t, want.getOrElse(id, Nil)),
            s"$tag: cut text diverges for doc $id")
        }
      }
    }
  }

  test("withinDoc span dedup trims self-repetition only: the second " +
      "in-doc copy of a passage is cut, identical cross-doc passages " +
      "are untouched") {
    import spark.implicits._
    val p = "w1 w2 w3 w4 w5 w6 w7 w8"
    val df = Seq(
      // the passage twice in ONE doc: second copy cut
      (1L, s"intro $p mid $p outro"),
      // the SAME passage once here: cross-doc dup, but withinDoc
      // ignores it — untouched
      (2L, s"other $p tail"),
      (3L, "no repeats at all in this one truly")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(df, "doc_id", "text", k = 8,
      withinDoc = true)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(
      (1L, s"intro $p mid  outro"),
      (2L, s"other $p tail"),
      (3L, "no repeats at all in this one truly")))
    // keepFirst=false cuts BOTH in-doc copies
    val both = Dedup.dedupSpans(df, "doc_id", "text", k = 8,
      withinDoc = true, keepFirst = false)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(both.head == "intro  mid  outro", both.head)
    // audit covers the removed copy exactly
    val audit = Dedup.spanAudit(df, "doc_id", "text", k = 8,
      withinDoc = true).collect()
    assert(audit.length == 1 && audit(0).getLong(0) == 1L &&
      audit(0).getString(3) == p, audit.mkString(","))
  }

  test("dedupSpans mask variant replaces each span with the marker, " +
      "preserving surrounding text exactly") {
    import spark.implicits._
    val p = "p1 p2 p3 p4 p5 p6 p7 p8"
    val df = Seq(
      (1L, s"keep $p tail"),
      (2L, s"also $p end"),
      (3L, "unrelated text entirely here okay fine")
    ).toDF("doc_id", "text")
    val masked = Dedup.dedupSpans(df, "doc_id", "text", k = 8,
      mask = Some("<|dup|>"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(masked.toSeq == Seq(
      (1L, s"keep $p tail"), // keeper: untouched
      (2L, "also <|dup|> end"),
      (3L, "unrelated text entirely here okay fine")))
  }

  test("duplicatedSpans shuffles carry hashes and positions, never " +
      "text — the discovery pass is 20 bytes per shingle at any " +
      "corpus size") {
    val sp = Dedup.duplicatedSpans(plantedDocs, "doc_id", "text", k = 8)
    sp.collect()
    val exchanges = Fixtures.collectExchanges(sp.queryExecution.executedPlan)
    assert(exchanges.nonEmpty, "expected shuffles in the discovery pass")
    exchanges.foreach { e =>
      val strs = e.output.filter(_.dataType ==
        org.apache.spark.sql.types.StringType)
      assert(strs.isEmpty,
        s"string attributes crossed a shuffle: ${strs.map(_.name)}")
    }
  }

  test("dedupSpans end to end never shuffles text either: the final " +
      "assembly joins the doc-bounded span table INTO the corpus " +
      "(AQE broadcast), so the corpus stays in place at any scale") {
    val out = Dedup.dedupSpans(plantedDocs, "doc_id", "text", k = 8)
    out.collect()
    val plan = out.queryExecution.executedPlan
    val exchanges = Fixtures.collectExchanges(plan)
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val strs = e.output.filter(_.dataType ==
        org.apache.spark.sql.types.StringType)
      assert(strs.isEmpty,
        s"text crossed a shuffle in the full dedupSpans: " +
          s"${strs.map(_.name)} — the span-side join must broadcast")
    }
  }

  test("dedupSpans is independent of the input partitioning") {
    val a = Dedup.dedupSpans(plantedDocs.repartition(13, col("doc_id")),
      "doc_id", "text", k = 8).select("doc_id", "text")
    val b = Dedup.dedupSpans(plantedDocs.coalesce(1),
      "doc_id", "text", k = 8).select("doc_id", "text")
    Fixtures.assertSameRows(a, b)
  }

  /** Composed-pass reference: self hits from the original shingles,
    * cross-doc duplication over the shingles surviving the merged
    * self spans, union merged — the alsoWithinDoc definition. */
  private def bruteComposed(
      texts: Map[Long, String], k: Int): Map[Long, Seq[(Int, Int)]] = {
    val ws = " \t\n\r"
    def toks(t: String): IndexedSeq[(String, Int, Int)] = {
      val buf = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
      var i = 0
      while (i < t.length) {
        if (!ws.contains(t(i))) {
          val s = i
          while (i < t.length && !ws.contains(t(i))) i += 1
          buf += ((t.substring(s, i), s, i))
        } else i += 1
      }
      buf.toIndexedSeq
    }
    def merge(sp: Seq[(Int, Int)]): Seq[(Int, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      for ((s, e) <- sp.sorted) {
        if (out.nonEmpty && s <= out.last._2)
          out(out.length - 1) = (out.last._1, math.max(out.last._2, e))
        else out += ((s, e))
      }
      out.toSeq
    }
    val sh = texts.toSeq.flatMap { case (id, t) =>
      val tk = toks(t)
      (0 to tk.length - k).map { i =>
        val key = (i until i + k).map(tk(_)._1).mkString(" ")
        (id, key, tk(i)._2, tk(i + k - 1)._3)
      }
    }
    // stage 1: within-doc, keepFirst
    val selfHits = sh.groupBy(x => (x._1, x._2)).toSeq
      .filter(_._2.size >= 2)
      .flatMap { case (_, os) => os.sortBy(_._3).tail }
      .map(o => (o._1, o._3, o._4))
    val selfMerged = selfHits.groupBy(_._1)
      .map { case (id, hs) => id -> merge(hs.map(h => (h._2, h._3))) }
    // stage 2: cross-doc over shingles not overlapping a self span
    val surv = sh.filterNot { case (id, _, s, e) =>
      selfMerged.getOrElse(id, Nil).exists(m => s < m._2 && e > m._1)
    }
    val crossHits = surv.groupBy(_._2).toSeq
      .filter(_._2.map(_._1).distinct.size >= 2)
      .flatMap { case (_, os) => os.sortBy(o => (o._1, o._3)).tail }
      .map(o => (o._1, o._3, o._4))
    (selfHits ++ crossHits).groupBy(_._1)
      .map { case (id, hs) => id -> merge(hs.map(h => (h._2, h._3))) }
      .filter(_._2.nonEmpty)
  }

  test("alsoWithinDoc composes self-trim with cross-doc dedup in one " +
      "call, equal to running the two passes sequentially on a " +
      "seam-free corpus") {
    import spark.implicits._
    val p = "p1 p2 p3 p4 p5 p6 p7 p8"
    val df = Seq(
      (1L, s"base one text here is quite long truly $p mid $p"),
      (2L, s"another document entirely different words $p"),
      (3L, "no duplicate anything at all here honestly truly")
    ).toDF("doc_id", "text")
    val sequential = Dedup.dedupSpans(
      Dedup.dedupSpans(df, "doc_id", "text", k = 8, withinDoc = true),
      "doc_id", "text", k = 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val composed = Dedup.dedupSpans(df, "doc_id", "text", k = 8,
      alsoWithinDoc = true)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(composed.toSeq == sequential.toSeq,
      "one-call composition must equal sequential application")
    // the work really happened in both dimensions: doc 1 lost its
    // second in-doc copy but kept the corpus keeper; doc 2 lost its
    // cross-doc copy
    val byId = composed.toMap
    assert(byId(1L) == s"base one text here is quite long truly $p mid ")
    assert(byId(2L) == "another document entirely different words ")
    assert(byId(3L) == "no duplicate anything at all here honestly truly")
  }

  test("alsoWithinDoc fuzz: low-vocab corpora match the composed " +
      "reference (self hits + cross-doc over surviving shingles)") {
    import spark.implicits._
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(100 + seed)
      val texts = (0L until 25L).map { i =>
        i -> (0 until (8 + rnd.nextInt(30)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }.toMap
      val df = texts.toSeq.toDF("doc_id", "text")
      val want = bruteComposed(texts, k = 3)
      val got = Dedup.duplicatedSpans(df, "doc_id", "text", k = 3,
        alsoWithinDoc = true)
        .collect().groupBy(_.getLong(0))
        .map { case (id, rs) =>
          id -> rs.map(r => (r.getInt(1), r.getInt(2))).sorted.toSeq
        }
      assert(got == want, s"seed=$seed: composed spans diverge")
      val cut = Dedup.dedupSpans(df, "doc_id", "text", k = 3,
        alsoWithinDoc = true)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      texts.foreach { case (id, t) =>
        assert(cut(id) == excise(t, want.getOrElse(id, Nil)),
          s"seed=$seed: cut text diverges for doc $id")
      }
    }
  }

  test("alsoWithinDoc tokenizes the corpus ONCE: a single shingle " +
      "Generate node (behind a reused shuffle), and no text in any " +
      "exchange") {
    val out = Dedup.dedupSpans(plantedDocs, "doc_id", "text", k = 8,
      alsoWithinDoc = true)
    out.collect()
    val plan = out.queryExecution.executedPlan
    def countShingleGen(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.{
        AdaptiveSparkPlanExec, QueryStageExec}
      p match {
        case a: AdaptiveSparkPlanExec => countShingleGen(a.executedPlan)
        case s: QueryStageExec => countShingleGen(s.plan)
        case g: org.apache.spark.sql.execution.GenerateExec =>
          (if (g.generator.exists(
            _.isInstanceOf[graft.functions.TokenSpanShinglesExpr])) 1
          else 0) + g.children.map(countShingleGen).sum
        case other =>
          other.children.map(countShingleGen).sum +
            other.subqueries.map(countShingleGen).sum
      }
    }
    val n = countShingleGen(plan)
    assert(n == 1, s"expected ONE shingle tokenization, found $n")
    Fixtures.collectExchanges(plan).foreach { e =>
      val strs = e.output.filter(_.dataType ==
        org.apache.spark.sql.types.StringType)
      assert(strs.isEmpty,
        s"text crossed a shuffle: ${strs.map(_.name)}")
    }
  }

  test("dedupSpansBatch against a persisted shingle index equals a " +
      "one-shot dedupSpans over (corpus ∪ batch) restricted to the " +
      "batch; the appended index makes the NEXT batch cumulative") {
    import spark.implicits._
    val corpusTexts = Map(
      0L -> s"zero intro $SpanPassage trailing bits",
      2L -> "two has nothing shared with anything else truly",
      4L -> s"four also carries $SpanPassage at its middle okay")
    val p2 = "n1 n2 n3 n4 n5 n6 n7 n8 n9" // batch-only passage
    val b1Texts = Map(
      1L -> s"one copies $SpanPassage from the corpus side",
      3L -> s"three brings $p2 fresh to the corpus",
      5L -> s"five repeats $p2 inside the same batch too")
    val b2Texts = Map(
      7L -> s"seven re-submits $p2 a batch later on",
      9L -> "nine is entirely novel text with no duplicate runs")
    val idx = Fixtures.tempDir("span-idx") + "/idx"
    Dedup.buildSpanIndex(spark, corpusTexts.toSeq.toDF("doc_id", "text"),
      "doc_id", "text", idx, k = 8)

    // batch 1: the one-shot reference over corpus ∪ batch1
    val want1 = bruteSpans(corpusTexts ++ b1Texts, k = 8, keepFirst = true)
    val got1 = Dedup.dedupSpansBatch(spark,
      b1Texts.toSeq.toDF("doc_id", "text"), "doc_id", "text", idx)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    b1Texts.foreach { case (id, t) =>
      assert(got1(id) == excise(t, want1.getOrElse(id, Nil)),
        s"batch-1 doc $id diverges from the one-shot reference")
    }
    // the corpus copy won: doc 1 lost the passage, doc 3 (the min-id
    // batch occurrence of p2) kept it, doc 5 lost it
    assert(!got1(1L).contains(SpanPassage) && got1(3L).contains(p2) &&
      !got1(5L).contains(p2))

    // batch 2: p2 is now INDEXED (batch 1's cut shingles appended) —
    // doc 7's copy must be cut even though no corpus doc carried p2
    // at build time; the reference is the one-shot over everything
    // ingested so far (corpus + CUT batch 1) ∪ batch 2
    val want2 = bruteSpans(corpusTexts ++ got1 ++ b2Texts,
      k = 8, keepFirst = true)
    val got2 = Dedup.dedupSpansBatch(spark,
      b2Texts.toSeq.toDF("doc_id", "text"), "doc_id", "text", idx)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    b2Texts.foreach { case (id, t) =>
      assert(got2(id) == excise(t, want2.getOrElse(id, Nil)),
        s"batch-2 doc $id diverges")
    }
    assert(!got2(7L).contains(p2),
      "the span index append must make ingestion cumulative")

    // re-running the same batch yields the SAME cut (self-exclusion:
    // the batch's own indexed shingles never count as duplicates —
    // the crash-replay determinism guarantee)
    val replay = Dedup.dedupSpansBatch(spark,
      b2Texts.toSeq.toDF("doc_id", "text"), "doc_id", "text", idx,
      appendToIndex = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(replay == got2, "a replayed batch must recompute identically")

    // an unindexed dir refuses loudly
    val e = intercept[IllegalArgumentException](
      Dedup.dedupSpansBatch(spark, b2Texts.toSeq.toDF("doc_id", "text"),
        "doc_id", "text", Fixtures.tempDir("span-noidx")))
    assert(e.getMessage.contains("buildSpanIndex"), e.getMessage)
  }

  test("dedupSpansBatch never shuffles text either: discovery rides " +
      "(hash, id, start) rows, assembly broadcasts the span side") {
    import spark.implicits._
    val idx = Fixtures.tempDir("span-idx-plan") + "/idx"
    Dedup.buildSpanIndex(spark,
      plantedDocs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      idx, k = 8)
    val out = Dedup.dedupSpansBatch(spark,
      plantedDocs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
      idx, appendToIndex = false)
    out.collect()
    val exchanges =
      Fixtures.collectExchanges(out.queryExecution.executedPlan)
    assert(exchanges.nonEmpty, "expected shuffles in the discovery pass")
    exchanges.foreach { e =>
      val strs = e.output.filter(_.dataType ==
        org.apache.spark.sql.types.StringType)
      assert(strs.isEmpty,
        s"string attributes crossed a shuffle: ${strs.map(_.name)}")
    }
  }

  // ---- byte-level BPE ----

  /** Independent BPE reference: a functional merge loop over the
    * published algorithm, sharing NO code with the expression. */
  private def refBpePieces(
      text: String, merges: Seq[(String, String)]): Seq[String] = {
    val ranks = merges.zipWithIndex.toMap
    val pat = java.util.regex.Pattern.compile(
      "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
        "|\\s+(?!\\S)|\\s+",
      java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)
    // the published bytes_to_unicode, derived independently
    val printable =
      ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val byteMap: Map[Int, Char] = {
      var next = 256
      (0 until 256).map { b =>
        if (printable(b)) b -> b.toChar
        else { val c = next.toChar; next += 1; b -> c }
      }.toMap
    }
    def encode(piece: String): List[String] = {
      var word = piece.map(_.toString).toList
      var done = false
      while (!done && word.length > 1) {
        val present = word.zip(word.tail).filter(ranks.contains)
        if (present.isEmpty) done = true
        else {
          val (a, b) = present.minBy(ranks)
          val out = scala.collection.mutable.ListBuffer[String]()
          var rest = word
          while (rest.nonEmpty) rest match {
            case x :: y :: t if x == a && y == b =>
              out += x + y; rest = t
            case x :: t => out += x; rest = t
            case Nil =>
          }
          word = out.toList
        }
      }
      word
    }
    val m = pat.matcher(text)
    val out = scala.collection.mutable.ListBuffer[String]()
    while (m.find()) {
      val mapped = m.group().getBytes("UTF-8").map(b =>
        byteMap(b & 0xff)).mkString
      out ++= encode(mapped)
    }
    out.toSeq
  }

  test("BPE: the persisted-model expression runs the published " +
      "cascade (hand-worked hello-model), ids resolve through the " +
      "vocab, and an inconsistent vocab refuses loudly") {
    import spark.implicits._
    import graft.functions.Bpe
    val dir = Fixtures.tempDir("bpe-hello") + "/model"
    val merges = Seq(("h", "e"), ("l", "l"), ("he", "ll"),
      ("hell", "o"), ("Ġ", "h"))
    Bpe.writeModel(spark, dir, merges,
      Map("hello" -> 5, "Ġ" -> 6, "w" -> 7, "o" -> 8, "r" -> 9,
        "l" -> 10, "d" -> 11, "Ġh" -> 12))
    val m = Bpe.loadModel(spark, dir)
    assert(m.merges == merges, "merges.txt must roundtrip in order")
    val got = Seq("hello hello").toDF("t")
      .select(Bpe.bpeCount(col("t"), m).as("n"),
        Bpe.bpeTokens(col("t"), m).as("ids"))
      .collect().head
    // "hello" -> [hello]; " hello" -> [Ġ,he,l,l,o] ... wait: Ġh rank
    // 4 beats nothing until h merges away: (h,e) fires first, leaving
    // Ġ,he,ll,o -> hell -> hello -> (Ġ,hello) unranked = 2 pieces
    assert(got.getInt(0) == 3, s"count ${got.getInt(0)}")
    assert(got.getSeq[Int](1) == Seq(5, 6, 5), got.getSeq[Int](1))
    // reference agreement on the same model
    assert(refBpePieces("hello hello", merges) ==
      Seq("hello", "Ġ", "hello"))
    // a piece the vocab lacks refuses with its name
    val e = intercept[Exception] {
      Seq("zz").toDF("t")
        .select(Bpe.bpeTokens(col("t"), m)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("vocab does not hold piece")),
      msgs(e).mkString(" | "))
  }

  test("BPE fuzz: random low-alphabet corpora match the independent " +
      "reference across a random merge table; counts are " +
      "partitioning-independent") {
    import spark.implicits._
    import graft.functions.Bpe
    val letters = "abcd"
    val rnd = new scala.util.Random(7)
    // a merge table that cascades: letter pairs, then pair+letter
    val merges = Seq(("a", "b"), ("c", "d"), ("ab", "cd"), ("b", "c"),
      ("abcd", "abcd"), ("Ġ", "a"), ("d", "a"), ("Ġa", "b"))
    val dir = Fixtures.tempDir("bpe-fuzz") + "/model"
    Bpe.writeModel(spark, dir, merges, Map.empty)
    val m = Bpe.loadModel(spark, dir)
    val texts = (0 until 60).map { i =>
      i.toLong -> (0 until rnd.nextInt(30)).map(_ =>
        if (rnd.nextInt(5) == 0) ' '
        else letters(rnd.nextInt(letters.length))).mkString
    }
    val got = texts.toDF("id", "t")
      .select(col("id"), Bpe.bpeCount(col("t"), m).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == refBpePieces(t, merges).length,
        s"doc $id '$t' diverges from the reference")
    }
    // partitioning independence (trivial for a per-row kernel, pinned
    // anyway: the count feeds budget fills that assume it)
    val a = texts.toDF("id", "t").repartition(7)
      .select(col("id"), Bpe.bpeCount(col("t"), m).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val b = texts.toDF("id", "t").coalesce(1)
      .select(col("id"), Bpe.bpeCount(col("t"), m).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("BPE model loading refuses loudly: missing files, malformed " +
      "merge line; tokenizer= threads real counts into packSequences " +
      "and sampleByTokenBudget") {
    import spark.implicits._
    import graft.functions.Bpe
    val e1 = intercept[IllegalArgumentException](
      Bpe.loadModel(spark, Fixtures.tempDir("bpe-empty")))
    assert(e1.getMessage.contains("merges.txt"), e1.getMessage)
    val bad = Fixtures.tempDir("bpe-bad") + "/model"
    val (fs, p) = graft.core.GraftFs.resolve(spark, bad)
    graft.core.GraftFs.writeString(fs,
      new org.apache.hadoop.fs.Path(p, "merges.txt"), "a b c\n")
    graft.core.GraftFs.writeString(fs,
      new org.apache.hadoop.fs.Path(p, "vocab.json"), "{}")
    val e2 = intercept[IllegalArgumentException](Bpe.loadModel(spark, bad))
    assert(e2.getMessage.contains("merge line"), e2.getMessage)

    // tokenizer threading == explicit precomputed column
    val dir = Fixtures.tempDir("bpe-thread") + "/model"
    Bpe.writeModel(spark, dir, Seq(("a", "b")), Map.empty)
    val m = Bpe.loadModel(spark, dir)
    val df = docs.limit(100).select(col("doc_id"),
      col("text"), col("source"))
    val pre = df.withColumn("n_tok",
      Bpe.bpeCount(coalesce(col("text"), lit("")), m).cast("long"))
    val viaTok = graft.operators.Packing.packSequences(
      df, "doc_id", "n_tok", seqLen = 512,
      tokenizer = Some(("text", m)))
      .select("doc_id", "n_tok", "tok_offset", "seq_first", "n_seqs")
    val viaCol = graft.operators.Packing.packSequences(
      pre, "doc_id", "n_tok", seqLen = 512)
      .select("doc_id", "n_tok", "tok_offset", "seq_first", "n_seqs")
    Fixtures.assertSameRows(viaTok, viaCol)
    val sTok = graft.operators.Sampling.sampleByTokenBudget(
      df, "source", "doc_id", "n_tok", budget = 2000L,
      tokenizer = Some(("text", m)))
      .select("doc_id", "n_tok").orderBy("doc_id")
    val sCol = graft.operators.Sampling.sampleByTokenBudget(
      pre, "source", "doc_id", "n_tok", budget = 2000L)
      .select("doc_id", "n_tok").orderBy("doc_id")
    Fixtures.assertSameRows(sTok, sCol)
  }

  test("forgetDocuments propagates deletion through the ingestion " +
      "spine: corpus rows go, index bands hide (ghost bands match " +
      "nothing), and equivalent content can re-ingest") {
    import graft.core.PDataset
    val base = Fixtures.tempDir("forget")
    val corpusDir = base + "/corpus"
    val idxDir = base + "/idx"
    val all = docs.select("doc_id", "text")
    PDataset.fromDataFrame(all, Seq("doc_id")).writeParquet(corpusDir)
    Dedup.buildMinhashIndex(spark, all, "doc_id", "text", idxDir)
    // re-ingest EXACT copies under shifted ids: WITHOUT forgetting,
    // every copy matches its indexed original and drops
    val copies = all.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val nCopies = copies.count()
    val blocked = Dedup.dedupBatch(spark, copies, "doc_id", "text",
      PDataset.scanParquet(spark, corpusDir).toDF, idxDir)
    assert(blocked.count() < nCopies,
      "fixture must have copies blocked by their indexed originals")
    // forget the originals -> their rows AND bands go
    val ids = all.filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val (cRep, iRep, _) = Dedup.forgetDocuments(
      spark, corpusDir, idxDir, ids)
    assert(cRep.dropped + cRep.rewritten > 0, cRep.toString)
    assert(iRep.marked == ids.length * 21L, // 21 bands per document
      s"expected ${ids.length * 21} marked band rows, got ${iRep.marked}")
    assert(PDataset.scanParquet(spark, corpusDir).toDF
      .filter(col("doc_id") % 10 === 0).count() == 0)
    // the same copies now pass the gate except where they match LIVE
    // corpus docs or each other — exactly the batch policy with the
    // originals absent
    val after = Dedup.dedupBatch(spark, copies, "doc_id", "text",
      PDataset.scanParquet(spark, corpusDir).toDF, idxDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expectBlockedStill = Dedup.minhashNearDupPairs(
      PDataset.scanParquet(spark, corpusDir).toDF.unionByName(copies),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a >= 1000000L || b >= 1000000L }
      .map { case (a, b) =>
        if (a >= 1000000L && b >= 1000000L) b
        else if (a >= 1000000L) a else b
      }.toSet
    val expected = copies.select("doc_id").collect()
      .map(_.getLong(0)).toSet -- expectBlockedStill
    assert(after == expected,
      s"missing ${(expected -- after).take(5)}, " +
        s"ghost-blocked ${(after -- expected).take(5)}")
  }

  test("forgetDocuments with vectorIndexDir sweeps the ANN index in " +
      "the same call: forgotten ids vanish from topK AND pqTopK " +
      "alongside corpus rows and MinHash bands") {
    import graft.core.PDataset
    import graft.operators.VectorIndex
    val base = Fixtures.tempDir("forget-vec")
    val corpusDir = base + "/corpus"
    val idxDir = base + "/idx"
    val vecDir = base + "/vec"
    // corpus and vector index share the id space: doc i's embedding
    // is embeddings row i
    val all = docs.filter(col("doc_id") < 300).select("doc_id", "text")
    PDataset.fromDataFrame(all, Seq("doc_id")).writeParquet(corpusDir)
    Dedup.buildMinhashIndex(spark, all, "doc_id", "text", idxDir)
    VectorIndex.build(spark,
      emb.filter(col("vec_id") < 300), "vec_id", "embedding", vecDir,
      dim = 64, nlist = 8, pq = Some((16, 32)))
    val qs = emb.filter(col("vec_id") < 5)
    val before = VectorIndex.topK(spark, qs, vecDir,
      "vec_id", "embedding", 5)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(before.nonEmpty)
    val victims = before.take(3).toSeq
    val (cRep, iRep, vRep) = Dedup.forgetDocuments(
      spark, corpusDir, idxDir, victims, vectorIndexDir = Some(vecDir))
    assert(cRep.dropped + cRep.rewritten > 0, cRep.toString)
    assert(iRep.marked == victims.length * 21L, iRep.toString)
    assert(vRep.exists(_.marked == victims.length), vRep.toString)
    assert(PDataset.scanParquet(spark, corpusDir).toDF
      .filter(col("doc_id").isin(victims: _*)).count() == 0)
    val after = VectorIndex.topK(spark, qs, vecDir,
      "vec_id", "embedding", 5)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !after.contains(v)),
      s"still ANN-retrievable: ${victims.filter(after.contains)}")
    val afterPq = VectorIndex.pqTopK(spark, qs, vecDir,
      "vec_id", "embedding", 5)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !afterPq.contains(v)),
      "PQ path must hide forgotten ids too")
  }

  test("SemDeDup keeper=centroidFarthest keeps, per duplicate group, " +
      "the member with the LOWEST cosine to its cell centroid " +
      "(arXiv:2303.09540's rule), matching a recomputed reference") {
    // Planted near-dups that are DIRECTION-perturbed (one element
    // nudged 2%), not just scaled: cosine-to-centroid is
    // scale-invariant, so a pure scaling would make every group an FP
    // tie and the test vacuous. A 2% single-element nudge keeps
    // pair cosine ~0.9999+ (still pairs) while moving the member's
    // angle to its centroid measurably.
    val base = emb.filter(col("vec_id") < 60).select("vec_id", "embedding")
    val perturbed = base.select((col("vec_id") + 1000).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === pmod(col("vec_id"), lit(64)).cast("int"),
          x * lit(1.02f)).otherwise(x)).as("embedding"))
    val all = base.unionByName(perturbed)
    val pairRows = Dedup.semDedupPairs(all, "vec_id", "embedding",
      dim = 64, threshold = 0.9999, nClusters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairRows.size >= 40,
      s"fixture too weak: only ${pairRows.size} planted pairs found")
    val paired = pairRows.flatMap(p => Seq(p._1, p._2))
    val kept = Dedup.semDedup(all, "vec_id", "embedding",
      dim = 64, threshold = 0.9999, nClusters = 4,
      keeper = "centroidFarthest")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // Unpaired rows always pass through.
    val allIds = all.select("vec_id").collect().map(_.getLong(0)).toSet
    assert((allIds -- paired).subsetOf(kept), "unpaired rows must survive")
    // Recompute the rule independently: same trained centroids,
    // driver-side cosines; per group keep argmin cosine (farthest).
    val cents = Similarity.trainCentroids(
      all, "vec_id", "embedding", 64, 4, 3, 11L, 1.0)
    val scored = all.select(col("vec_id"),
      element_at(VectorExpressions.nearestCentroids(
        col("embedding"), cents, 1), 1).as("cell"),
      col("embedding")).collect().map { r =>
        val v = r.getSeq[Float](2).map(_.toDouble).toArray
        val c = cents(r.getInt(1))
        val cos = v.zip(c).map { case (x, y) => x * y }.sum /
          (math.sqrt(v.map(x => x * x).sum) *
            math.sqrt(c.map(x => x * x).sum))
        r.getLong(0) -> cos
      }.toMap
    var decisive = 0
    pairRows.foreach { case (a, b) =>
      assert(kept.contains(a) ^ kept.contains(b),
        s"group ($a,$b) must keep exactly one member")
      // Pin the choice only where the rule is decisive beyond FP
      // noise; FP ties fall to the min-id tie-break either way.
      if (scored(a) < scored(b) - 1e-9) {
        decisive += 1
        assert(kept.contains(a),
          s"($a,$b): farthest is $a (cos ${scored(a)} < ${scored(b)})")
      } else if (scored(b) < scored(a) - 1e-9) {
        decisive += 1
        assert(kept.contains(b),
          s"($a,$b): farthest is $b (cos ${scored(b)} < ${scored(a)})")
      }
    }
    assert(decisive >= 20,
      s"only $decisive decisive groups — perturbation too weak to " +
        "exercise the rule")
    val unknownKeeper = intercept[IllegalArgumentException] {
      Dedup.semDedup(all, "vec_id", "embedding", dim = 64,
        threshold = 0.9999, nClusters = 4, keeper = "nope")
    }
    assert(unknownKeeper.getMessage.contains("keeper"))
  }

  test("SemDeDup hot-cell hardening: a cell past maxCellRows splits " +
      "into hash sub-cells that bound the pair-join group size, and " +
      "exact duplicates (identical vector bytes) still co-locate") {
    // 120 vectors that all land in one Voronoi cell: copies of a
    // single base vector with tiny jitter, plus 20 EXACT duplicate
    // pairs (identical bytes) planted among them.
    val baseVec = (0 until 64).map(i => 1.0f + 0.001f * i).toArray
    val rows = (0 until 100).map { i =>
      val v = baseVec.clone(); v(i % 64) += 0.0005f * ((i % 7) + 1)
      (i.toLong, v.toSeq)
    } ++ (0 until 20).map { i => // exact dups of the first 20
      val v = baseVec.clone(); v(i % 64) += 0.0005f * ((i % 7) + 1)
      ((i + 500).toLong, v.toSeq)
    }
    val skewed = rows.toDF("vec_id", "embedding")
    // Bound 16 rows per sub-cell: the 120-row hot cell must split.
    val pairs = Dedup.semDedupPairs(skewed, "vec_id", "embedding",
      dim = 64, threshold = 1.0, nClusters = 2, maxCellRows = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Exact duplicates hash to the same sub-cell — every planted
    // identical pair is found despite the split.
    (0 until 20).foreach { i =>
      assert(pairs.contains((i.toLong, (i + 500).toLong)),
        s"exact dup ($i, ${i + 500}) lost to the sub-cell split")
    }
    // And the split actually bounds the join groups: recompute the
    // operator's own (cell, sub) rule — assign cells with the same
    // trained centroids, split each cell into ceil(n/16) hash
    // sub-cells — and pin the max occupancy well below the unsplit
    // hot cell (hash variance allows some overshoot of the 16 target,
    // never a rejoined hot cell).
    val cents = Similarity.trainCentroids(
      skewed, "vec_id", "embedding", 64, 2, 3, 11L, 1.0)
    val assigned = skewed.select(
      element_at(VectorExpressions.nearestCentroids(
        col("embedding"), cents, 1), 1).as("__cell"),
      col("embedding"))
    val cellCounts = assigned.groupBy("__cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cellCounts.values.max > 16, "fixture must have a hot cell")
    val occ = cellCounts.toSeq.flatMap { case (cell, cn) =>
      val nsub = math.max(1L, math.ceil(cn / 16.0).toLong)
      assigned.filter(col("__cell") === cell)
        .select(pmod(xxhash64(col("embedding")), lit(nsub)).as("__sub"))
        .groupBy("__sub").count().collect().map(_.getLong(1))
    }
    assert(occ.max <= 48,
      s"sub-cell occupancy ${occ.sorted.reverse.take(5).mkString(",")} " +
        "not bounded by the split")
  }

  test("SemDeDup: intra-cluster pairs find planted scaled near-dups " +
      "and the corpus keeps one canonical survivor per group") {
    // A scaled copy has cosine exactly 1 with its original AND maps to
    // the same Voronoi cell (nearest-centroid by cosine geometry is
    // scale-invariant up to FP noise at these magnitudes), so the
    // published cluster-then-pair shape must find every planted group.
    val base = emb.filter(col("vec_id") < 100).select("vec_id", "embedding")
    val scaled = base.select((col("vec_id") + 1000).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
    val all = base.unionByName(scaled)
    val pairs = Dedup.semDedupPairs(all, "vec_id", "embedding",
      dim = 64, threshold = 0.9999, nClusters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 100L).map(i => (i, i + 1000)).toSet,
      s"missed: ${((0L until 100L).map(i => (i, i + 1000)).toSet -- pairs).take(5)}")
    val kept = Dedup.semDedup(all, "vec_id", "embedding",
      dim = 64, threshold = 0.9999, nClusters = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 100L).toSet) // min id per group survives
  }

  test("hyperplane_sigs kernel matches per-table composed signatures") {
    val sigs = emb.limit(40).select(col("vec_id"),
      Similarity.hyperplaneSigs(col("embedding"), 64, 6, 4, seed = 7L).as("ks"),
      array((0 until 4).map(t =>
        Similarity.hyperplaneSignature(col("embedding"), 64, 6, 7L + t * 1013L))
        : _*).as("cs"))
      .collect()
    sigs.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"vec ${r.getLong(0)}: kernel != composed")
    }
  }

  // ---- similarity search ----

  test("LSH ANN recall vs brute force top-5") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // This corpus is near-orthogonal random vectors (best cosine ~0.48),
    // so buckets must be coarse: few planes, many tables.
    val approx = Similarity.lshTopK(queries, emb, "vec_id", "embedding", 5, 64,
      nPlanes = 4, tables = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH recall $recall too low") // approximate by design
  }

  test("nearest_centroids kernel matches a driver-side reference") {
    val cents = Array(
      Array.fill(64)(0.5), Array.fill(64)(-0.5), Array.fill(64)(0.0),
      Array.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0))
    val rows = emb.limit(30).select(col("vec_id"),
      graft.functions.VectorExpressions
        .nearestCentroids(col("embedding"), cents, 4).as("nc"),
      col("embedding")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](2).toArray
      val want = cents.indices
        .map(c => (cents(c).indices.map { i =>
          val x = if (i < v.length) v(i).toDouble else 0.0
          val d = x - cents(c)(i); d * d
        }.sum, c))
        .sortBy(identity).map(_._2)
      assert(r.getSeq[Int](1) == want,
        s"vec ${r.getLong(0)}: ${r.getSeq[Int](1)} != $want")
    }
  }

  test("nearest_centroids generates valid code for float and double arrays") {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val cents = Array(Array(0.0, 0.0), Array(1.0, 1.0))
    def nc(a: Any) = GraftBridge.compileAndEval(
      graft.functions.NearestCentroidsExpr(Literal.create(a), cents, 2))
      .asInstanceOf[ArrayData].toIntArray.toSeq
    assert(nc(Array(0.1f, 0.1f)) == Seq(0, 1))
    assert(nc(Array(0.9, 0.9)) == Seq(1, 0))
  }

  test("IVF finds planted nearest neighbors (recall@1 on near-dup pairs)") {
    val base = emb.filter(col("vec_id") < 100).select("vec_id", "embedding")
    val perturbed = base.select((col("vec_id") + 1000).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
    val corpus = base.unionByName(perturbed)
    val top1 = Similarity.ivfTopK(base, corpus, "vec_id", "embedding",
      k = 1, dim = 64, nlist = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // each original's exact nearest neighbor is its scaled copy
    val found = top1.count { case (q, n) => n == q + 1000 }
    assert(top1.length == 100, s"expected 100 query rows, got ${top1.length}")
    assert(found >= 95, s"IVF found only $found/100 planted neighbors")
  }

  test("meanPool averages each dimension per group and refuses " +
      "ragged vector lengths loudly") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(3.0f, 4.0f, 5.0f)),
      (2L, Array(10.0f, 20.0f, 30.0f))
    ).toDF("doc", "vec")
    val got = Similarity.meanPool(df, "doc", "vec", out = "pooled")
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
    assert(got.toSeq == Seq(
      (1L, Seq(2.0, 3.0, 4.0)),
      (2L, Seq(10.0, 20.0, 30.0))))
    // ragged group: loud refusal naming the group
    val ragged = Seq(
      (1L, Array(1.0f, 2.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f))
    ).toDF("doc", "vec")
    val e = intercept[Exception] {
      Similarity.meanPool(ragged, "doc", "vec").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("mixes vector lengths")),
      msgs(e).mkString(" | "))
  }

  test("meanPool is bit-deterministic across shuffle partitionings") {
    // double summation order varies with partitioning; the decimal-sum
    // mean must not (the r19 q_embed_pool driver failure mode)
    val base = emb.limit(200)
      .withColumn("doc", col("vec_id") % 7)
    val conf = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(conf)
    try {
      val runs = Seq("1", "7", "32").map { n =>
        spark.conf.set(conf, n)
        Similarity.meanPool(base, "doc", "embedding", out = "pooled")
          .orderBy("doc").collect()
          .map(r => (r.getLong(0),
            r.getSeq[Double](1).map(java.lang.Double.doubleToLongBits)))
          .toSeq
      }
      assert(runs(0) == runs(1) && runs(1) == runs(2),
        "meanPool output varies with shuffle partitioning")
    } finally spark.conf.set(conf, saved)
  }

  test("cosine is symmetric and self-similarity is 1") {
    val a = emb.filter(col("vec_id") === 0).select(col("embedding")).collect()(0)
      .getSeq[Float](0)
    val self = emb.filter(col("vec_id") === 0)
      .select((VectorExpressions.vecDot(col("embedding"), col("embedding")) /
        (Similarity.l2norm(col("embedding")) * Similarity.l2norm(col("embedding"))))
        .as("c")).collect()(0).getDouble(0)
    assert(math.abs(self - 1.0) < 1e-9)
  }

  // ---- text analysis ----

  test("pq_adc kernel: zero at the encoded centroid, codegen compiles") {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    // two subspaces of dim 2, two centroids each
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)),
      Array(Array(2.0, 2.0), Array(3.0, 3.0)))
    val q = Literal.create(Array(1.0, 1.0, 2.0, 2.0), ArrayType(DoubleType))
    val codes = Literal(new GenericArrayData(Array(1, 0)),
      ArrayType(IntegerType, containsNull = false))
    val zero = GraftBridge.compileAndEval(
      graft.functions.PqAdcExpr(q, codes, books)).asInstanceOf[Double]
    assert(zero == 0.0)
    // distance to the other code pair: (1,1)->(0,0) is 2, (2,2)->(3,3) is 2
    val codes2 = Literal(new GenericArrayData(Array(0, 1)),
      ArrayType(IntegerType, containsNull = false))
    val far = GraftBridge.compileAndEval(
      graft.functions.PqAdcExpr(q, codes2, books)).asInstanceOf[Double]
    assert(far == 4.0)
  }

  test("pqTopK is deterministic and beats random recall vs the L2 baseline") {
    val q = emb.filter(col("vec_id") < 5)
    val approx = Similarity.pqTopK(q, emb, "vec_id", "embedding",
      k = 5, dim = 64, m = 16, ksub = 32)
    val again = Similarity.pqTopK(q, emb, "vec_id", "embedding",
      k = 5, dim = 64, m = 16, ksub = 32)
    val a1 = approx.orderBy("query_id", "rank").collect().toSeq
    assert(a1 == again.orderBy("query_id", "rank").collect().toSeq)
    val brute = Similarity.bruteForceL2TopK(q, emb, "vec_id", "embedding", 5)
    val hits = brute.select("query_id", "neighbor_id")
      .join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    // corpus 200 at sf0.001: random recall@5 would be ~5/200
    assert(hits >= 5, s"recall too low: $hits/25")
    assert(a1.size == 25)
  }

  test("ivfPqTopK: deterministic, beats random recall, equi-join plan") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    def run() = Similarity.ivfPqTopK(q, emb, "vec_id", "embedding",
      k = 5, dim = 64, nlist = 8, nprobe = 3, m = 16, ksub = 16)
    val approx = run()
    // deterministic end to end (seeded training, tie-broken ranks)
    assert(approx.orderBy("query_id", "rank").collect().toSeq ==
      run().orderBy("query_id", "rank").collect().toSeq)
    // candidates come from an equi-join on the cell id — never a
    // cross join or nested-loop over all (query, corpus) pairs
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // recall beats random by an order of magnitude (corpus 200 at
    // sf0.001: random recall@5 ~ 5/200)
    val brute = Similarity.bruteForceL2TopK(q, emb, "vec_id", "embedding", 5)
    val hits = brute.select("query_id", "neighbor_id")
      .join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(hits >= 3, s"recall too low: $hits/25")
  }

  test("nearDupClusters labels components with their min id") {
    // chain 1-2-3, pair 10-11, triangle 20-21-22 (one redundant edge)
    val pairs = Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("idA", "idB")
    val want = Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 3L), (21L, 20L, 3L), (22L, 20L, 3L))
    def run(cap: Long) = Dedup.nearDupClusters(pairs, maxDriverEdges = cap)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // driver union-find fast path and distributed loop agree exactly
    assert(run(1L << 20) == want)
    assert(run(0L) == want)
  }

  test("nearDupClusters runs one job per propagation round") {
    // 6-chain: pointer jumping converges in a handful of rounds; each
    // round must cost exactly one job (materialize + change count in
    // the same pass — no separate diff join against the old labels).
    val pairs = (1L to 5L).map(i => (i, i + 1)).toDF("idA", "idB")
    // Count ACTIONS (SQL executions), not Spark jobs: AQE legitimately
    // splits one action into a job per materialized stage.
    val n = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            n.incrementAndGet()
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val got =
      try {
        // maxDriverEdges = 0 forces the distributed loop (the driver
        // union-find fast path would short-circuit this tiny graph)
        val out = Dedup.nearDupClusters(pairs, maxDriverEdges = 0).collect()
        org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
        out
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(got.length == 6)
    assert(got.forall(r => r.getLong(1) == 1L && r.getLong(2) == 6L))
    // edge count + one count per round + the checkpoint + the final
    // collect — single digits, vs 2x with a per-round diff-join
    // materialization
    assert(n.get <= 10, s"expected one action per round, saw ${n.get}")
  }

  test("text functions: tokens, quality, langId, fingerprint") {
    val df = Seq(
      "The quick brown fox jumps over the lazy dog.",
      "der hund und die katze sind nicht da",
      "  spaced    out   ").toDF("text")
    val out = df.select(
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.langId(col("text")).as("lang"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      TextFunctions.qualityScore(col("text")).as("q")).collect()
    assert(out(0).getInt(0) == 9)
    assert(out(0).getString(1) == "en")
    assert(out(1).getString(1) == "de")
    assert(out(2).getInt(0) == 2)
    assert(out.forall(_.getString(2).length == 32))
    assert(out.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("canon_text: Unicode canonicalization matches the ASCII SQL " +
      "form, strips accents, composes NFC, and compiles under codegen") {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    // codegen path (compileAndEval throws on invalid generated Java)
    def canon(s: String): String =
      GraftBridge.compileAndEval(graft.functions.CanonTextExpr(
        Literal.create(s))).toString
    // ASCII: byte-identical to
    // trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
    assert(canon("  Hello,   WORLD!! 42 ") == "hello world 42")
    assert(canon("...") == "")
    assert(canon("") == "")
    assert(canon("a") == "a")
    // NFC: decomposed e+combining-acute equals precomposed é, and
    // both strip to plain e
    assert(canon("Café Noir") == "cafe noir")
    assert(canon("Café Noir") == "cafe noir")
    // standalone non-mark letters survive accent stripping (DuckDB
    // strip_accents agrees: 'ø' is not a combining mark)
    assert(canon("Søren") == "søren")
    // Turkish dotted capital İ: lowercases to i + combining dot,
    // which the NFD pass strips
    assert(canon("İstanbul") == "istanbul")
    // punctuation-only separators between words fold to one space
    assert(canon("a--b__c\t\nd") == "a b c d")
    // interpreted path agrees with codegen
    val expr = graft.functions.CanonTextExpr(
      Literal.create("Café -- NOIR  42"))
    assert(expr.eval(null).toString == canon("Café -- NOIR  42"))
    // null propagates
    assert(graft.functions.CanonTextExpr(
      Literal.create(null, org.apache.spark.sql.types.StringType))
      .eval(null) == null)
    // frame-level: canonical fingerprints unify trivially-different
    // duplicates that raw hashing misses
    val df = Seq("The Cat!", "the   cat", "EL GATO").toDF("text")
    val n = df.select(md5(TextFunctions.canonText(col("text"))).as("fp"))
      .distinct().count()
    assert(n == 2, "two canonical groups")
    // ...and the exactDedup integration: canonical=true collapses
    // them, raw hashing does not
    val docs3 = Seq((1L, "The Cat!"), (2L, "the   cat"), (3L, "EL GATO"))
      .toDF("doc_id", "text")
    assert(Dedup.exactDedup(docs3, "doc_id", "text").count() == 3)
    val canonGroups = Dedup.exactDedup(docs3, "doc_id", "text",
      canonical = true).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(canonGroups == Set((1L, 2L), (3L, 1L)),
      s"min-id wins per canonical group: ${canonGroups.mkString(",")}")
  }

  test("word shingles respect boundaries") {
    val out = Seq("a b c d", "a b", "x").toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 3).as("sh"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) == List("a b c", "b c d"))
    assert(out(1) == List("a b"))
    assert(out(2) == List("x"))
  }

  // ---- multimodal plumbing ----

  test("multimodal payload roundtrip with stub decode") {
    val withPayload = Multimodal.attachPayload(docs.limit(20), "doc_id", "text")
    assert(withPayload.schema("payload").dataType == BinaryType)
    val feats = Multimodal.decodeStub(withPayload, "doc_id")
    val row = feats.orderBy("doc_id").collect()(0)
    val txt = docs.orderBy("doc_id").collect()(0).getAs[String]("text")
    assert(row.getAs[Int]("n_bytes") == txt.getBytes("UTF-8").length)
    assert(row.getAs[Double]("mean_byte") > 0)
    assert(row.getAs[String]("head_hex").length == 16)
  }

  test("char_gram_hash64 kernel matches the composed gram+hash pipeline") {
    import graft.functions.SketchExpressions
    val rows = docs.limit(20).select(
      SketchExpressions.charGramHash64(
        TextFunctions.normText(col("text")), 5, 2).as("kernel"),
      SketchExpressions.stringArrayHash64(
        TextFunctions.charGrams(col("text"), 5), "md5_62").as("composed"))
      .collect()
    rows.foreach(r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "gram hash mismatch"))
  }

  test("winnowing fingerprints overlap iff documents share long substrings") {
    val shared = "the quick brown fox jumps over the lazy dog again"
    val df = Seq(
      ("A prefix text here. " + shared, 1L),
      (shared + " and a different suffix entirely", 2L),
      ("completely unrelated content with other words inside", 3L))
      .toDF("text", "id")
      .select(col("id"),
        TextFunctions.winnowFingerprints(col("text")).as("fps"))
    val byId = df.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap
    // winnowing guarantee: a shared substring of length >= k + w - 1
    // (here 8 chars; `shared` is far longer) shares a fingerprint
    assert((byId(1L) & byId(2L)).nonEmpty, "shared substring not detected")
    assert((byId(1L) & byId(3L)).size < byId(1L).size / 4,
      "unrelated docs overlap too much")
    // deterministic and sorted
    val again = Seq(("A prefix text here. " + shared, 1L)).toDF("text", "id")
      .select(TextFunctions.winnowFingerprints(col("text"))).collect()(0)
      .getSeq[Long](0)
    assert(again == again.sorted && again.toSet == byId(1L))
  }

  test("frame sampling slices payload bytes deterministically") {
    val df = Seq((1L, "abcdefghij"), (2L, "")).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(
      Multimodal.attachPayload(df, "doc_id", "text"),
      "doc_id", frameBytes = 4, stride = 2)
      .orderBy("doc_id", "frame_idx").collect()
    // 10 bytes -> frames [abcd][efgh][ij]; stride 2 keeps idx 0 and 2
    assert(frames.length == 2)
    assert(frames(0).getAs[Int]("frame_idx") == 0 &&
      new String(frames(0).getAs[Array[Byte]]("frame")) == "abcd" &&
      frames(0).getAs[Int]("frame_bytes") == 4)
    assert(frames(1).getAs[Int]("frame_idx") == 2 &&
      new String(frames(1).getAs[Array[Byte]]("frame")) == "ij" &&
      frames(1).getAs[Int]("frame_bytes") == 2)
    assert(frames(0).getAs[String]("head_hex") == "61626364")
  }

  // ---- events (batch) ----

  test("sessionization counts sessions per user deterministically") {
    val ev = Seq(
      (1L, ts("2024-01-01T10:00:00"), 7L, "click", 1.0, ""),
      (2L, ts("2024-01-01T10:10:00"), 7L, "click", 1.0, ""),
      (3L, ts("2024-01-01T11:30:00"), 7L, "view", 1.0, ""),
      (4L, ts("2024-01-01T10:00:00"), 8L, "view", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.sessionStats(ev, 30).orderBy("user_id").collect()
    assert(out(0).getLong(0) == 7L && out(0).getLong(1) == 2L)
    assert(out(1).getLong(0) == 8L && out(1).getLong(1) == 1L)
  }

  private def ts(s: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(s + "Z"))
}
