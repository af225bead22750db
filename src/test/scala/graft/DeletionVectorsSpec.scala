package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftFs, PDataset}
import graft.operators.{DeletionVectors, Maintenance}
import Fixtures._

/** Merge-on-read deletes: marking writes no data file, the overlay
  * scan equals a rewrite-based delete, rewriting ops refuse while
  * vectors are pending, and materialize folds them in exactly. */
class DeletionVectorsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def srcDF(n: Long): DataFrame =
    spark.range(0L, n).select(
      col("id").as("k"),
      (col("id") % 10).as("grp"),
      concat(lit("p"), col("id")).as("payload"))

  private def writeSrc(dir: String, n: Int): Unit = {
    val parts = (0 until n by 100).map { lo =>
      PDataset.fromDataFrame(
        srcDF(math.min(100, n - lo).toLong)
          .withColumn("k", col("k") + lo), Seq("k"))
    }
    PDataset.concat(parts).writeParquet(dir)
  }

  private def dataFiles(dir: String): Map[String, Long] = {
    val (fs, p) = GraftFs.resolve(spark, dir)
    fs.listStatus(p).filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(st => st.getPath.getName -> st.getLen).toMap
  }

  test("deleteKeys marks rows without touching any data file") {
    val dir = tempDir("dv-mark") + "/t"
    writeSrc(dir, 600)
    val before = dataFiles(dir)
    val keys = spark.range(0, 600).filter(col("id") % 7 === 0)
      .select(col("id").as("k"))
    val rep = DeletionVectors.deleteKeys(spark, dir, keys)
    assert(rep.marked == 86, s"marked ${rep.marked}")
    assert(dataFiles(dir) == before,
      "a deletion-vector delete must not touch data files")
    // merge-on-read hides them; the plain scan still sees them
    assert(DeletionVectors.scan(spark, dir).count() == 600 - 86)
    assert(PDataset.scanParquet(spark, dir).toDF.count() == 600)
    // a second commit accumulates
    DeletionVectors.deleteKeys(spark, dir,
      Seq(1L, 2L).toDF("k"))
    assert(DeletionVectors.scan(spark, dir).count() == 600 - 86 - 2)
  }

  test("merge-on-read scan equals a rewrite-based delete") {
    val root = tempDir("dv-parity")
    writeSrc(root + "/a", 500)
    writeSrc(root + "/b", 500)
    val keys = spark.range(0, 500)
      .filter(col("id") % 11 === 3).select(col("id").as("k"))
    DeletionVectors.deleteKeys(spark, root + "/a", keys)
    Maintenance.deleteKeys(spark, root + "/b", keys)
    assertSameRows(DeletionVectors.scan(spark, root + "/a"),
      PDataset.scanParquet(spark, root + "/b").toDF)
  }

  test("deleteKeys reads only the files its keys route to") {
    val dir = tempDir("dv-pruned") + "/t"
    writeSrc(dir, 1000) // 10 files of 100 rows
    // keys confined to one partition's range
    val keys = spark.range(210, 240).select(col("id").as("k"))
    var read = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read += e.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      DeletionVectors.deleteKeys(spark, dir, keys)
      org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    // one routed partition (100 rows) + the key frame (30) + the DV
    // read-back; far under the 1000-row table
    assert(read < 300, s"expected a pruned scan, read $read records")
  }

  test("deleteWhere reads only files overlapping an index-column range") {
    val dir = tempDir("dv-where-pruned") + "/t"
    writeSrc(dir, 1000) // 10 files of 100 rows, clustered on k
    var read = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read += e.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    val rep = try {
      val r = DeletionVectors.deleteWhere(spark, dir,
        col("k") >= 210 && col("k") < 240 && col("grp") =!= 5)
      org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
      r
    } finally spark.sparkContext.removeSparkListener(listener)
    // k in [210, 240) is 30 rows, minus the three with grp == 5
    assert(rep.marked == 27 && rep.affectedFiles == 1, s"$rep")
    // only the one overlapping 100-row file + the small DV read-back;
    // an unpruned scan would read all 1000
    assert(read < 300, s"expected a bounds-pruned scan, read $read records")
    assert(DeletionVectors.scan(spark, dir).count() == 1000 - 27)
    // a provably non-overlapping range touches nothing at all
    assert(DeletionVectors.deleteWhere(spark, dir, col("k") >= 5000)
      == DeletionVectors.Report(0L, 0))
  }

  test("deleteWhere prunes an IN-list via its convex hull") {
    val dir = tempDir("dv-in-pruned") + "/t"
    writeSrc(dir, 1000) // 10 files of 100 rows, clustered on k
    var read = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read += e.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    val rep = try {
      // the classic clustered-erasure shape: ids inside one band
      val r = DeletionVectors.deleteWhere(spark, dir,
        col("k").isin(421L, 437L, 455L, 480L))
      org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
      r
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(rep.marked == 4 && rep.affectedFiles == 1, s"$rep")
    // hull [421, 480] covers only the [400, 500) file
    assert(read < 300, s"expected a hull-pruned scan, read $read records")
    assert(DeletionVectors.scan(spark, dir).count() == 996)
  }

  test("deleteWhere prunes through an equality prefix on a " +
      "two-column index, like the read path") {
    val dir = tempDir("dv-where-prefix") + "/t"
    // 20 files indexed on (grp, k): per grp value, TWO files covering
    // k [0,100) and [100,200) — the first index column alone cannot
    // separate them
    val rows = spark.range(0, 2000).select(
      (col("id") / 200).cast("long").as("grp"),
      (col("id") % 200).as("k"),
      concat(lit("p"), col("id")).as("payload"))
    val parts = for (g <- 0 until 10; half <- 0 until 2) yield
      PDataset.fromDataFrame(
        rows.filter(col("grp") === g &&
          col("k") >= half * 100 && col("k") < (half + 1) * 100),
        Seq("grp", "k"))
    PDataset.concat(parts).writeParquet(dir)
    var read = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read += e.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    val rep = try {
      // grp = 7 keeps two files; the k-range keeps only the upper
      // half — the equality-prefix lex walk must combine both
      val r = DeletionVectors.deleteWhere(spark, dir,
        col("grp") === 7 && col("k") >= 120 && col("k") < 140)
      org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
      r
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(rep.marked == 20 && rep.affectedFiles == 1, s"$rep")
    // one 100-row file + the small DV read-back — first-column-only
    // pruning would have scanned both grp-7 files (200+)
    assert(read < 180, s"expected a prefix-pruned scan, read $read records")
    assert(DeletionVectors.scan(spark, dir).count() == 1980)
  }

  test("deleteWhere marks by predicate; scan and materialize agree") {
    val dir = tempDir("dv-where") + "/t"
    writeSrc(dir, 500)
    val rep = DeletionVectors.deleteWhere(spark, dir,
      col("grp") === 3 && col("k") < 250)
    assert(rep.marked == 25, s"$rep")
    // reconstruct the fixture's content (grp/payload derive from the
    // within-block id) and apply the same predicate logically
    val full = (0 until 500 by 100)
      .map(lo => srcDF(100).withColumn("k", col("k") + lo))
      .reduce(_ unionByName _)
    val want = full.filter(!(col("grp") === 3 && col("k") < 250))
    assertSameRows(DeletionVectors.scan(spark, dir), want)
    DeletionVectors.materialize(spark, dir)
    assertSameRows(PDataset.scanParquet(spark, dir).toDF, want)
  }

  test("format(\"graft\") applies pending vectors transparently") {
    val dir = tempDir("dv-sql") + "/t"
    writeSrc(dir, 500)
    DeletionVectors.deleteKeys(spark, dir,
      spark.range(0, 500).filter(col("id") % 9 === 1)
        .select(col("id").as("k")))
    val sqlRead = spark.read.format("graft").load(dir)
    assertSameRows(sqlRead, DeletionVectors.scan(spark, dir))
    // count(*) through the SQL surface must NOT be sidecar-answered
    // while vectors pend (the metadata shortcut binds to the base
    // relation and declines here)
    assert(sqlRead.agg(count(lit(1))).head().getLong(0) == 500 - 56)
    // the escape hatch serves the raw base
    assert(spark.read.format("graft")
      .option("ignoreDeletionVectors", "true").load(dir)
      .count() == 500)
    // materialize folds in; the SQL read flips back to the plain
    // pruned relation with identical rows
    DeletionVectors.materialize(spark, dir)
    assert(spark.read.format("graft").load(dir).count() == 500 - 56)
  }

  test("pushed filters still prune files under a pending-vector read") {
    val dir = tempDir("dv-sqlprune") + "/t"
    writeSrc(dir, 1000) // 10 files of 100 rows, indexed on k
    DeletionVectors.deleteKeys(spark, dir,
      spark.range(300, 320).select(col("id").as("k")))
    var read = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read += e.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    val got = try {
      val rows = spark.read.format("graft").load(dir)
        .filter(col("k") >= 510 && col("k") < 540)
        .select("k", "payload").collect()
      org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
      rows
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(got.length == 30)
    // the k-range prefilter reaches the base scan inside the anti
    // join: one 100-row file (+ the KB-scale vector read), not the
    // 1000-row table
    assert(read < 300, s"expected a pruned scan, read $read records")
  }

  test("non-folding rewrite ops refuse while vectors are pending; " +
      "row-level ops fold them instead") {
    val dir = tempDir("dv-guard") + "/t"
    writeSrc(dir, 300)
    DeletionVectors.deleteKeys(spark, dir, Seq(5L).toDF("k"))
    // deleteRange/compact/dropColumns still refuse (they rewrite or
    // re-describe files without folding the overlay)
    val ops: Seq[(String, () => Any)] = Seq(
      "deleteRange" -> (() => Maintenance.deleteRange(spark, dir,
        Seq(Some(0L)), Seq(Some(10L)))),
      "compact" -> (() => Maintenance.compact(spark, dir, 1000)),
      "dropColumns" -> (() => Maintenance.dropColumns(spark, dir,
        "payload")))
    for ((name, op) <- ops) {
      val e = intercept[IllegalStateException](op())
      assert(e.getMessage.contains("materialize"), s"$name: $e")
    }
    // metadata-only addColumns stays allowed
    Maintenance.addColumns(spark, dir,
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.StringType))
  }

  test("keyed upsert folds pending vectors of affected files and " +
      "clears exactly their overlay entries") {
    val dir = tempDir("dv-fold-upsert") + "/t"
    writeSrc(dir, 300) // 3 files of 100 consecutive keys
    // marks in two different files: key 5 (file 0) and key 250 (file 2)
    DeletionVectors.deleteKeys(spark, dir, Seq(5L, 250L).toDF("k"))
    assert(DeletionVectors.exists(spark, dir))
    // upsert touching ONLY file 0: folds key 5's mark into the
    // rewrite, leaves file 2's mark pending
    val r = Maintenance.upsert(spark, dir,
      srcDF(1).withColumn("k", lit(7L)).withColumn("payload", lit("U")))
    assert(r.rewritten == 1, r.toString)
    assert(DeletionVectors.exists(spark, dir),
      "the untouched file's mark must stay pending")
    val scanned = DeletionVectors.scan(spark, dir)
    assert(scanned.count() == 298) // 300 - deleted 5 - deleted 250
    assert(scanned.filter(col("k") === 5L).isEmpty,
      "the folded mark must not resurrect")
    assert(scanned.filter(col("k") === 7L).head().getString(2) == "U")
    // the plain (overlay-blind) scan of the rewritten table shows the
    // folded delete baked into file 0's replacement
    assert(PDataset.scanParquet(spark, dir).toDF
      .filter(col("k") === 5L).isEmpty)
    // materialize the remainder: everything agrees
    DeletionVectors.materialize(spark, dir)
    assert(!DeletionVectors.exists(spark, dir))
    assert(PDataset.scanParquet(spark, dir).toDF.count() == 298)
  }

  test("updateWhere folds pending vectors: deleted rows neither " +
      "update nor resurrect, and a fully-deleted file drops") {
    val dir = tempDir("dv-fold-update") + "/t"
    writeSrc(dir, 300)
    DeletionVectors.deleteWhere(spark, dir, col("k") >= 10 && col("k") < 20)
    val r = Maintenance.updateWhere(spark, dir,
      col("k") < 30, Seq("payload" -> lit("X")))
    assert(r.rewritten == 1)
    assert(!DeletionVectors.exists(spark, dir),
      "the only marked file was rewritten; its entries must clear")
    val got = PDataset.scanParquet(spark, dir).toDF
    assert(got.count() == 290)
    assert(got.filter(col("k") >= 10 && col("k") < 20).isEmpty)
    assert(got.filter(col("payload") === "X").count() == 20) // 0-9,20-29
    // a file whose every row is already marked has no LIVE hits: the
    // update skips it entirely and its marks stay pending
    val dir2 = tempDir("dv-fold-drop") + "/t"
    writeSrc(dir2, 300)
    DeletionVectors.deleteWhere(spark, dir2, col("k") < 100) // all of file 0
    val r2 = Maintenance.updateWhere(spark, dir2,
      col("k") < 150, Seq("payload" -> lit("Y")))
    assert(r2.rewritten == 1, r2.toString) // only the second file
    assert(DeletionVectors.exists(spark, dir2),
      "the all-marked file was not rewritten; its marks must survive")
    val got2 = DeletionVectors.scan(spark, dir2)
    assert(got2.count() == 200)
    assert(got2.filter(col("payload") === "Y").count() == 50)
    assert(PDataset.scanParquet(spark, dir2).isDisjoint)
  }

  test("materialize folds the vectors in and re-enables maintenance") {
    val dir = tempDir("dv-mat") + "/t"
    writeSrc(dir, 600) // 6 files
    val keys = spark.range(100, 130).select(col("id").as("k"))
    DeletionVectors.deleteKeys(spark, dir, keys)
    val want = DeletionVectors.scan(spark, dir).collect()
      .map(_.toString).sorted
    val before = dataFiles(dir)
    val rep = DeletionVectors.materialize(spark, dir)
    // only the one affected file rewritten; overlay gone
    assert(rep.rewritten == 1 && rep.untouched == 5, s"$rep")
    assert(!DeletionVectors.exists(spark, dir))
    val after = dataFiles(dir)
    assert((before.keySet -- after.keySet).size == 1,
      "exactly one file replaced")
    val got = PDataset.scanParquet(spark, dir).toDF.collect()
      .map(_.toString).sorted
    assert(got.toSeq == want.toSeq)
    // maintenance works again
    Maintenance.upsert(spark, dir,
      srcDF(1).withColumn("k", lit(9999L)))
    assert(PDataset.scanParquet(spark, dir).toDF.count() == 571)
  }

  test("materialize scatter runs at the affected width, not the file count") {
    val dir = tempDir("dv-mat-dense") + "/t"
    writeSrc(dir, 2400) // 24 files of 100 consecutive keys
    assert(graft.core.Sidecar.load(spark, dir).files.length == 24)
    // marks land in exactly 2 files (k∈[100,106) → file 1, [2000,2006) → file 20)
    DeletionVectors.deleteKeys(spark, dir,
      (Seq(100L, 101L, 102L, 2000L, 2001L, 2002L)).toDF("k"))
    val widths = scala.collection.concurrent.TrieMap.empty[Int, Int]
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        widths.put(sc.stageInfo.stageId, sc.stageInfo.numTasks)
    }
    spark.sparkContext.addSparkListener(l)
    val rep = try {
      val r = DeletionVectors.materialize(spark, dir)
      org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
      r
    } finally spark.sparkContext.removeSparkListener(l)
    assert(rep.rewritten == 2 && rep.untouched == 22, s"$rep")
    // The scatter must shuffle at affected.length (2): a sparse
    // scatter at m.files.length would surface a 24-task stage here
    // (and a 5×10^5-task one at the file ceiling).
    val maxWidth = widths.values.max
    assert(maxWidth <= 8,
      s"a 2-file materialize on a 24-file table ran a $maxWidth-task " +
        s"stage (widths ${widths.values.toVector.sorted})")
    assert(PDataset.scanParquet(spark, dir).toDF.count() == 2394)
    assert(PDataset.scanParquet(spark, dir).isDisjoint)
    assert(!DeletionVectors.exists(spark, dir))
  }

  test("materialize(retain) feeds DV deletes to an incremental view") {
    val root = tempDir("dv-view")
    val src = root + "/src"
    writeSrc(src, 600)
    graft.operators.IncrementalAgg.build(spark, src, root + "/view",
      Seq("grp"), Nil)
    // marking alone changes NO generation: the view stays fresh and
    // keeps summarizing the base table (vectors are a read overlay)
    DeletionVectors.deleteKeys(spark, src,
      spark.range(0, 60).select(col("id").as("k")))
    assert(graft.operators.IncrementalAgg.isFresh(spark, root + "/view"))
    // folding them in WITH retain produces a feed generation the view
    // absorbs like any other retained mutation
    DeletionVectors.materialize(spark, src, retain = true)
    assert(!graft.operators.IncrementalAgg.isFresh(spark, root + "/view"))
    assert(graft.operators.IncrementalAgg.refresh(spark, root + "/view") > 0L)
    val got = PDataset.scanParquet(spark, root + "/view").toDF
      .select("grp", "n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = PDataset.scanParquet(spark, src).toDF
      .groupBy("grp").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("pending-vector format(\"graft\") read plans the native anti " +
      "join — columnar parquet scan, no RDD exit") {
    val dir = tempDir("dv-nativeplan") + "/t"
    writeSrc(dir, 500)
    DeletionVectors.deleteKeys(spark, dir, Seq(3L, 7L).toDF("k"))
    val df = spark.read.format("graft").load(dir)
      .filter(col("k") < 100).select("k", "payload")
    assert(df.count() == 98)
    val plan = df.queryExecution.executedPlan.toString
    // The extensions rule spliced the merge-on-read plan in during
    // analysis: the physical plan is the broadcast anti join over the
    // VECTORIZED parquet scan — the pre-round-12 V1 path surfaced as
    // an opaque row-converting "Scan graft" RDD node instead.
    assert(plan.contains("Scan parquet"),
      s"expected the columnar parquet scan in the plan:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"expected the DV broadcast anti join in the plan:\n$plan")
    assert(!plan.contains("ExistingRDD") && !plan.contains("Scan graft") &&
      !plan.contains("DeserializeToObject"),
      s"the native DV read must not exit through an RDD boundary:\n$plan")
  }

  test("self-join over one DV-pending DataFrame deduplicates the " +
      "spliced subplans") {
    val dir = tempDir("dv-selfjoin") + "/t"
    writeSrc(dir, 300)
    DeletionVectors.deleteKeys(spark, dir, Seq(5L).toDF("k"))
    val df = spark.read.format("graft").load(dir)
    // the SAME DataFrame on both sides: the substituted native plan
    // appears twice with identical exprIds until the analyzer's
    // DeduplicateRelations re-keys one side
    val joined = df.as("a").join(df.as("b"), "k")
    assert(joined.count() == 299)
  }

  test("the extension-less V1 fallback crosses the source boundary " +
      "as InternalRows (no row-conversion tax)") {
    val dir = tempDir("dv-fallback") + "/t"
    writeSrc(dir, 200)
    DeletionVectors.deleteKeys(spark, dir, Seq(1L, 2L).toDF("k"))
    val rel = new graft.sources.DvPendingRelation(spark, dir,
      graft.core.Sidecar.load(spark, dir).schema, spark.sqlContext)
    assert(!rel.needConversion,
      "the fallback must declare its rows pre-converted")
    val rdd = rel.buildScan(Array("k"), Array.empty)
      .asInstanceOf[org.apache.spark.rdd.RDD[Any]]
    assert(rdd.count() == 198)
    assert(rdd.first().isInstanceOf[
      org.apache.spark.sql.catalyst.InternalRow],
      "buildScan must emit InternalRows for the needConversion=false exit")
  }

  test("a fully-marked file is dropped by materialize") {
    val dir = tempDir("dv-dropall") + "/t"
    writeSrc(dir, 300) // 3 files of 100
    DeletionVectors.deleteKeys(spark, dir,
      spark.range(100, 200).select(col("id").as("k")))
    val rep = DeletionVectors.materialize(spark, dir)
    assert(rep.dropped == 1 && rep.rewritten == 0, s"$rep")
    assert(PDataset.scanParquet(spark, dir).toDF.count() == 200)
    assert(PDataset.scanParquet(spark, dir).npartitions == 2)
  }
}
