package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PDataset
import graft.operators.{IncrementalAgg, Maintenance}
import Fixtures._

/** Incrementally-maintained aggregate view: refresh must equal a full
  * rebuild after any retained source mutation, read only the delta
  * from the source, and remove groups whose count reaches zero. */
class IncrementalAggSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** keys lo until lo+n: grp cycles 0..9, qty = k % 13 (integral, so
    * incremental double sums are exact). */
  private def srcDF(lo: Long, n: Long, tag: String): DataFrame =
    spark.range(lo, lo + n).select(
      col("id").as("k"),
      (col("id") % 10).as("grp"),
      (col("id") % 13).cast("double").as("qty"),
      concat(lit(tag), col("id")).as("payload"))

  private def writeSrc(dir: String, n: Int): Unit = {
    val parts = (0 until n by 100).map { lo =>
      PDataset.fromDataFrame(srcDF(lo.toLong,
        math.min(100, n - lo).toLong, "v"), Seq("k"))
    }
    PDataset.concat(parts).writeParquet(dir)
  }

  private def expect(dir: String): Seq[(Long, Long, Double)] =
    PDataset.scanParquet(spark, dir).toDF
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("qty").as("qty_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  private def got(viewDir: String): Seq[(Long, Long, Double)] =
    PDataset.scanParquet(spark, viewDir).toDF
      .collect().map(r => (r.getAs[Long]("grp"), r.getAs[Long]("n"),
        r.getAs[Double]("qty_sum")))
      .sortBy(_._1).toSeq

  test("refresh after retained mutations equals a full rebuild") {
    val root = tempDir("incragg")
    val src = root + "/src"
    val view = root + "/view"
    writeSrc(src, 600)
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"))
    assert(got(view) == expect(src))

    // retained upsert: updates + inserts
    Maintenance.upsert(spark, src,
      srcDF(250, 3, "u").withColumn("qty", lit(99.0))
        .unionByName(srcDF(5000, 4, "i")), retain = true)
    // retained point-delete
    Maintenance.deleteKeys(spark, src,
      Seq(10L, 11L, 305L).toDF("k"), retain = true)
    val touched = IncrementalAgg.refresh(spark, view)
    assert(touched > 0)
    assert(got(view) == expect(src))

    // idempotent: a second refresh with no new generations is a no-op
    assert(IncrementalAgg.refresh(spark, view) == 0L)
    assert(got(view) == expect(src))
  }

  test("refresh reads only the source delta, never rescans the source") {
    val root = tempDir("incragg-io")
    val src = root + "/src"
    val view = root + "/view"
    writeSrc(src, 1000) // 10 files of 100 rows
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"))
    Maintenance.upsert(spark, src,
      srcDF(450, 2, "u").withColumn("qty", lit(7.0)), retain = true)

    val read = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      IncrementalAgg.refresh(spark, view)
      org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(l)
    // Feed: one 100-row source file + its replacement. View: 10
    // groups, re-read across the semi join and the merge rewrite.
    // A source rescan would add 1000+ rows on its own.
    assert(read.get < 600,
      s"refresh read ${read.get} input rows; must be O(view + delta)")
    assert(got(view) == expect(src))
  }

  test("groups emptied by deletes are removed from the view") {
    val root = tempDir("incragg-del")
    val src = root + "/src"
    val view = root + "/view"
    writeSrc(src, 200)
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"))
    // wipe out every row of grp 3 (keys k % 10 == 3)
    val keys = (0L until 200L).filter(_ % 10 == 3)
    Maintenance.deleteKeys(spark, src, keys.toDF("k"), retain = true)
    IncrementalAgg.refresh(spark, view)
    val groups = got(view).map(_._1)
    assert(!groups.contains(3L), s"grp 3 still in view: $groups")
    assert(got(view) == expect(src))
  }

  test("a refreshed all-null group stores NULL sum, matching build") {
    val root = tempDir("incragg-nullsum")
    val src = root + "/src"
    val view = root + "/view"
    // grp 0's qty is ALL NULL; build stores sum = NULL for it (SQL
    // sum over zero non-null values). A refresh that touches grp 0
    // must preserve that, not coalesce to 0.0 (ADVICE r8 medium).
    val df = spark.range(0, 200).select(
      col("id").as("k"), (col("id") % 10).as("grp"),
      when(col("id") % 10 === 0, lit(null).cast("double"))
        .otherwise((col("id") % 13).cast("double")).as("qty"),
      concat(lit("v"), col("id")).as("payload"))
    PDataset.fromDataFrame(df, Seq("k")).writeParquet(src)
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"))
    def sums(): Map[Long, Option[Double]] =
      PDataset.scanParquet(spark, view).toDF.collect()
        .map(r => r.getAs[Long]("grp") ->
          (if (r.isNullAt(r.fieldIndex("qty_sum"))) None
           else Some(r.getAs[Double]("qty_sum")))).toMap
    assert(sums()(0L).isEmpty, "build must store NULL for an all-null group")
    // delete one of grp 0's (all-null) rows: the refresh merges the
    // group and must keep its sum NULL while the count drops by one
    Maintenance.deleteKeys(spark, src, Seq(10L).toDF("k"), retain = true)
    assert(IncrementalAgg.refresh(spark, view) > 0L)
    assert(sums()(0L).isEmpty,
      "refresh must keep an all-null group's sum NULL, not 0.0")
    val n0 = PDataset.scanParquet(spark, view).toDF
      .filter(col("grp") === 0L).select("n").collect().head.getLong(0)
    assert(n0 == 19L)
    // and every group (null and not) matches a full source aggregate
    val want = PDataset.scanParquet(spark, src).toDF
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("qty").as("qty_sum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val gotAll = PDataset.scanParquet(spark, view).toDF.collect()
      .map(r => r.getAs[Long]("grp") -> (r.getAs[Long]("n"),
        if (r.isNullAt(r.fieldIndex("qty_sum"))) None
        else Some(r.getAs[Double]("qty_sum")))).toMap
    assert(gotAll == want)
  }

  test("min/max columns maintain under insert-only deltas, repair deletes") {
    val root = tempDir("incragg-minmax")
    val src = root + "/src"
    val view = root + "/view"
    writeSrc(src, 300)
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"),
      minMaxCols = Seq("qty"))
    // insert-only delta: fresh keys only
    Maintenance.upsert(spark, src,
      srcDF(7000, 5, "i").withColumn("qty", lit(99.0)), retain = true)
    assert(IncrementalAgg.refresh(spark, view) > 0)
    val want = PDataset.scanParquet(spark, src).toDF
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("qty").as("qty_sum"),
        min("qty").as("qty_min"), max("qty").as("qty_max"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    val got = PDataset.scanParquet(spark, view).toDF
      .collect().map(r => (r.getAs[Long]("grp"), r.getAs[Long]("n"),
        r.getAs[Double]("qty_sum"), r.getAs[Double]("qty_min"),
        r.getAs[Double]("qty_max"))).sortBy(_._1).toSeq
    assert(got == want)
    assert(got.exists(_._5 == 99.0))
    // a delta containing a DELETE removes grp 0's extremum (k=7000,
    // qty 99): least/greatest merging could never lower the stored
    // max — the targeted repair recomputes it from the source
    Maintenance.deleteKeys(spark, src, Seq(7000L).toDF("k"), retain = true)
    assert(IncrementalAgg.refresh(spark, view) > 0)
    val want2 = PDataset.scanParquet(spark, src).toDF
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("qty").as("qty_sum"),
        min("qty").as("qty_min"), max("qty").as("qty_max"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    val got2 = PDataset.scanParquet(spark, view).toDF
      .collect().map(r => (r.getAs[Long]("grp"), r.getAs[Long]("n"),
        r.getAs[Double]("qty_sum"), r.getAs[Double]("qty_min"),
        r.getAs[Double]("qty_max"))).sortBy(_._1).toSeq
    assert(got2 == want2)
    val g0 = got2.find(_._1 == 0L).get
    assert(g0._5 == 12.0, s"grp 0 max must drop from 99 to 12, got ${g0._5}")
  }

  test("min/max delete repair rescans only the affected groups") {
    val root = tempDir("incragg-repair-io")
    val src = root + "/src"
    val view = root + "/view"
    // BLOCKED groups (grp = k / 100) in 100-row files: each file holds
    // exactly one group, so the repair's inlined IN prefilter lets
    // parquet row-group stats skip every unaffected file.
    val df = spark.range(0, 2000).select(
      col("id").as("k"), (col("id") / 100).cast("long").as("grp"),
      col("id").cast("double").as("qty"),
      concat(lit("v"), col("id")).as("payload"))
    PDataset.fromDataFrame(df, Seq("k")).repartition(100).writeParquet(src)
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"),
      minMaxCols = Seq("qty"))
    // delete grp 3's maximum (k = 399): only grp 3 needs repair
    Maintenance.deleteKeys(spark, src, Seq(399L).toDF("k"), retain = true)
    val read = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      assert(IncrementalAgg.refresh(spark, view) > 0)
      org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(l)
    // feed (~200: the replaced file before/after) + view (20 groups)
    // + repair (~100 rows of grp 3's file — NOT the 2000-row source;
    // a full repair rescan would blow straight past the bound)
    assert(read.get < 1000,
      s"delete repair read ${read.get} rows; must stay O(delta + group)")
    val got = PDataset.scanParquet(spark, view).toDF
      .filter(col("grp") === 3L).collect().map(r =>
        (r.getAs[Long]("n"), r.getAs[Double]("qty_min"),
          r.getAs[Double]("qty_max"))).toSeq
    assert(got == Seq((99L, 300.0, 398.0)),
      s"grp 3 must repair to max 398 after deleting 399, got $got")
    // and the whole view equals a rebuild
    val want = PDataset.scanParquet(spark, src).toDF
      .groupBy("grp").agg(min("qty").as("mn"), max("qty").as("mx"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val gotAll = PDataset.scanParquet(spark, view).toDF
      .collect().map(r => (r.getAs[Long]("grp"), r.getAs[Double]("qty_min"),
        r.getAs[Double]("qty_max"))).sortBy(_._1).toSeq
    assert(gotAll == want)
  }

  test("distinct sketches merge on inserts and repair on deletes") {
    val root = tempDir("incragg-distinct")
    val src = root + "/src"
    val view = root + "/view"
    writeSrc(src, 600)
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"),
      minMaxCols = Nil, distinctCols = Seq("payload"))
    def est(): Map[Long, Double] =
      IncrementalAgg.distinctEstimates(spark, view)
        .select("grp", "payload_nd").collect()
        .map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    def exact(): Map[Long, Long] =
      PDataset.scanParquet(spark, src).toDF
        .groupBy("grp").agg(countDistinct("payload").as("nd"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def check(where: String): Unit = {
      val (e, x) = (est(), exact())
      assert(e.keySet == x.keySet, s"$where: group sets differ")
      for ((g, nd) <- e)
        assert(math.abs(nd - x(g)) <= math.max(2.0, 0.1 * x(g)),
          s"$where: grp $g estimate $nd vs exact ${x(g)}")
    }
    check("after build")
    // insert-only delta (brand-new keys): sketches MERGE — no source
    // rescan — and track the new values
    Maintenance.upsert(spark, src,
      srcDF(7000, 40, "new"), retain = true)
    assert(IncrementalAgg.refresh(spark, view) > 0L)
    check("after insert-only refresh")
    // a delta with deletes (update rewrites = delete+insert, plus
    // point deletes) repairs the affected groups' sketches
    Maintenance.upsert(spark, src,
      srcDF(100, 5, "upd2").withColumn("payload", lit("rewritten")),
      retain = true)
    Maintenance.deleteKeys(spark, src,
      spark.range(200, 230).select(col("id").as("k")), retain = true)
    assert(IncrementalAgg.refresh(spark, view) > 0L)
    check("after delete-containing refresh")
    // counts stay EXACT throughout
    assert(got(view) == expect(src))
  }

  test("retarget re-binds a copied view; content mismatch refuses") {
    val root = tempDir("incragg-retarget")
    writeSrc(root + "/src", 300)
    IncrementalAgg.build(spark, root + "/src", root + "/view",
      Seq("grp"), Seq("qty"))
    // copy the whole pair (the relocation/promotion story)
    val dst = java.nio.file.Paths.get(root + "/copy")
    val s0 = java.nio.file.Paths.get(root)
    val walk = java.nio.file.Files.walk(s0)
    try walk.filter(p => p.startsWith(s0.resolve("src")) ||
        p.startsWith(s0.resolve("view"))).forEach { p =>
      val t = dst.resolve(s0.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else {
        java.nio.file.Files.createDirectories(t.getParent)
        java.nio.file.Files.copy(p, t); ()
      }
    } finally walk.close()
    val cSrc = root + "/copy/src"
    val cView = root + "/copy/view"
    IncrementalAgg.retarget(spark, cView, cSrc)
    assert(IncrementalAgg.viewMeta(spark, cView).srcDir == cSrc)
    // the re-bound copy refreshes against ITS source, original untouched
    Maintenance.upsert(spark, cSrc,
      srcDF(9000, 3, "c").withColumn("qty", lit(5.0)), retain = true)
    assert(IncrementalAgg.refresh(spark, cView) > 0L)
    assert(got(cView) == expect(cSrc))
    assert(got(root + "/view") == expect(root + "/src"))
    // retargeting to a directory with DIFFERENT content refuses: the
    // original source has since diverged from what the copy summarized
    val other = root + "/other"
    writeSrc(other, 200)
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.retarget(spark, root + "/view", other)
    }
    assert(e.getMessage.contains("differs"))
  }

  test("refresh fails loudly when the base generation was not retained") {
    val root = tempDir("incragg-loud")
    val src = root + "/src"
    val view = root + "/view"
    writeSrc(src, 200)
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"))
    // an UNretained mutation alone: no archive moved, but the source
    // no longer matches what the view summarized — a silent no-op
    // refresh would leave the view stale forever
    Maintenance.upsert(spark, src,
      srcDF(10, 1, "u").withColumn("qty", lit(1.0)))
    assertThrows[IllegalArgumentException] {
      IncrementalAgg.refresh(spark, view)
    }
    // a retained op on top archives the WRONG content under the
    // expected generation number — the content hash still catches it
    Maintenance.upsert(spark, src,
      srcDF(20, 1, "u").withColumn("qty", lit(2.0)), retain = true)
    assertThrows[IllegalArgumentException] {
      IncrementalAgg.refresh(spark, view)
    }
  }

  test("randomized retained mutations with interleaved vacuums stay exact") {
    val root = tempDir("incragg-rand")
    val src = root + "/src"
    val view = root + "/view"
    writeSrc(src, 400)
    // min/max included: the walk's random deletes exercise the
    // targeted repair path on every delete-containing refresh
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"),
      minMaxCols = Seq("qty"))
    def mmExpect(): Seq[(Long, Double, Double)] =
      PDataset.scanParquet(spark, src).toDF
        .groupBy("grp").agg(min("qty").as("mn"), max("qty").as("mx"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    def mmGot(): Seq[(Long, Double, Double)] =
      PDataset.scanParquet(spark, view).toDF
        .collect().map(r => (r.getAs[Long]("grp"),
          r.getAs[Double]("qty_min"), r.getAs[Double]("qty_max")))
        .sortBy(_._1).toSeq
    // Fixed-seed random walk over the op space the streaming sink
    // exercises in production: retained upserts (update + insert mix)
    // and point deletes accumulate across refreshes, and vacuum —
    // run only while the view is synced, the sink's discipline —
    // renumbers the history under the view's recorded base. Every
    // refresh must land exactly on a full rebuild of the source.
    val rnd = new scala.util.Random(20260813L)
    for (step <- 1 to 10) {
      rnd.nextInt(3) match {
        case 0 =>
          val lo = rnd.nextInt(500).toLong
          Maintenance.upsert(spark, src,
            srcDF(lo, 1L + rnd.nextInt(20), s"s$step")
              .withColumn("qty", lit(rnd.nextInt(9).toDouble)),
            retain = true)
        case 1 =>
          val lo = rnd.nextInt(400).toLong
          Maintenance.deleteKeys(spark, src,
            spark.range(lo, lo + 1 + rnd.nextInt(10))
              .select(col("id").as("k")),
            retain = true)
        case _ => () // let mutations accumulate before the next refresh
      }
      if (rnd.nextBoolean() || step == 10) {
        IncrementalAgg.refresh(spark, view)
        assert(got(view) == expect(src), s"diverged at step $step")
        assert(mmGot() == mmExpect(), s"min/max diverged at step $step")
        if (rnd.nextBoolean()) {
          val _ = Maintenance.vacuum(spark, src)
        }
      }
    }
  }

  test("refresh survives vacuum renumbering the history") {
    val root = tempDir("incragg-renum")
    val src = root + "/src"
    val view = root + "/view"
    writeSrc(src, 300)
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"))
    Maintenance.upsert(spark, src,
      srcDF(5, 3, "u").withColumn("qty", lit(4.0)), retain = true)
    assert(IncrementalAgg.refresh(spark, view) > 0L)
    // vacuum clears the history; the NEXT retained op renumbers its
    // archive from v0 while the view's recorded base stays at the
    // pre-vacuum number — refresh must resolve the base by content
    val _ = Maintenance.vacuum(spark, src)
    assert(Maintenance.versions(spark, src).isEmpty)
    Maintenance.upsert(spark, src,
      srcDF(50, 4, "w").withColumn("qty", lit(7.0)), retain = true)
    assert(Maintenance.versions(spark, src) == Seq(0))
    assert(IncrementalAgg.refresh(spark, view) > 0L)
    assert(got(view) == expect(src))
    // synced again: a further refresh is a no-op
    assert(IncrementalAgg.refresh(spark, view) == 0L)
  }
}
