package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PDataset
import graft.operators.{IncrementalAgg, Maintenance}
import graft.plans.ViewRewrite
import Fixtures._

/** Materialized-view rewrite: matching aggregates read the view, the
  * results stay identical, and every soundness gate (staleness,
  * time travel, non-rewritable shapes) declines rather than rewrites
  * wrong. */
class ViewRewriteSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def srcDF(lo: Long, n: Long): DataFrame =
    spark.range(lo, lo + n).select(
      col("id").as("k"),
      (col("id") % 10).as("grp"),
      (col("id") % 4).as("bucket"),
      (col("id") % 13).cast("double").as("qty"))

  private lazy val dirs: (String, String) = {
    val root = tempDir("view-rewrite")
    val src = root + "/src"
    val view = root + "/view"
    val parts = (0 until 800 by 100).map(lo =>
      PDataset.fromDataFrame(srcDF(lo.toLong, 100L), Seq("k")))
    PDataset.concat(parts).writeParquet(src)
    IncrementalAgg.build(spark, src, view,
      Seq("grp", "bucket"), Seq("qty"))
    ViewRewrite.register(spark, view)
    (src, view)
  }

  private def scannedFiles(df: DataFrame): Set[String] = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val files = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.toSeq
    }.flatten.toSet
    assert(files.nonEmpty, s"no file scans in plan:\n$plan")
    files
  }

  test("exact-grouping aggregate reads the view, results identical") {
    val (src, view) = dirs
    val q = spark.read.format("graft").load(src)
      .groupBy("grp", "bucket")
      .agg(count(lit(1)).as("n_rows"), sum("qty").as("total"))
    val files = scannedFiles(q)
    assert(files.nonEmpty && files.forall(_.contains("/view")),
      s"expected a view-only scan, got:\n${files.mkString("\n")}")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3))).sortBy(t => (t._1, t._2))
    val want = srcDF(0, 800).groupBy("grp", "bucket")
      .agg(count(lit(1)).as("n_rows"), sum("qty").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
  }

  test("rollup onto a grouping subset re-aggregates the view") {
    val (src, view) = dirs
    val q = spark.read.format("graft").load(src)
      .groupBy("grp").agg(count(lit(1)).as("n_rows"))
    assert(scannedFiles(q).forall(_.contains("/view")))
    val got = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 10L).map(_ -> 80L).toMap)
  }

  test("plain parquet reads of the source directory also rewrite") {
    val (src, _) = dirs
    val q = spark.read.parquet(src).groupBy("grp")
      .agg(sum("qty").as("total"))
    assert(scannedFiles(q).forall(_.contains("/view")))
    val want = srcDF(0, 800).groupBy("grp").agg(sum("qty").as("total"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      == want)
  }

  test("avg answers from the view's sum and non-null count — nulls exact") {
    val root = tempDir("view-rewrite-avg")
    val src = root + "/src"
    val view = root + "/view"
    // every 5th measure is NULL: avg must divide by the non-null
    // count, so a view tracking only `n` could not answer this
    val df = spark.range(0, 500).select(
      col("id").as("k"), (col("id") % 10).as("grp"),
      when(col("id") % 5 === 0, lit(null).cast("double"))
        .otherwise((col("id") % 13).cast("double")).as("qty"))
    PDataset.fromDataFrame(df, Seq("k")).repartition(100).writeParquet(src)
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"))
    ViewRewrite.register(spark, view)
    val q = spark.read.format("graft").load(src)
      .groupBy("grp").agg(avg("qty").as("a"))
    assert(scannedFiles(q).forall(_.contains("/view")))
    // groups 0 and 5 are ALL-null (their members are multiples of 5):
    // the rewrite must yield null exactly like avg, not divide by 0
    def vals(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val want = vals(df.groupBy("grp").agg(avg("qty").as("a")).collect())
    val got = vals(q.collect())
    assert(got.keySet == want.keySet)
    assert(want(0L).isEmpty && got(0L).isEmpty, "all-null group must avg null")
    got.foreach {
      case (g, Some(v)) =>
        assert(math.abs(v - want(g).get) < 1e-12, s"grp $g: $v vs ${want(g)}")
      case (g, None) => assert(want(g).isEmpty, s"grp $g: null vs ${want(g)}")
    }
  }

  test("count(col) answers from the view's non-null counts — nulls exact") {
    val root = tempDir("view-rewrite-cnt")
    val src = root + "/src"
    val view = root + "/view"
    // every 5th measure is NULL: count(qty) must skip exactly those,
    // which is the view's <qty>_nn — n (row count) would overcount
    val df = spark.range(0, 500).select(
      col("id").as("k"), (col("id") % 10).as("grp"),
      when(col("id") % 5 === 0, lit(null).cast("double"))
        .otherwise((col("id") % 13).cast("double")).as("qty"))
    PDataset.fromDataFrame(df, Seq("k")).repartition(100).writeParquet(src)
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"))
    ViewRewrite.register(spark, view)
    val q = spark.read.format("graft").load(src)
      .groupBy("grp").agg(count(col("qty")).as("c"),
        count(lit(1)).as("n_rows"))
    assert(scannedFiles(q).forall(_.contains("/view")))
    val want = df.groupBy("grp").agg(count(col("qty")).as("c"),
      count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).sortBy(_._1).toSeq == want)
    // groups 0 and 5 are all-null: count(qty) = 0 there, n_rows = 50
    assert(want.exists(t => t._1 == 0L && t._2 == 0L && t._3 == 50L))
    // and a GLOBAL count(col) under a no-rows filter is 0, not NULL
    val g = spark.read.format("graft").load(src)
      .filter(col("grp") < 0).agg(count(col("qty")).as("c"))
    assert(scannedFiles(g).forall(_.contains("/view")))
    val rows = g.collect()
    assert(rows.length == 1 && !rows.head.isNullAt(0) &&
      rows.head.getLong(0) == 0L)
  }

  test("decimal-typed sum and avg decline — doubles would round") {
    val root = tempDir("view-rewrite-dec")
    val src = root + "/src"
    val view = root + "/view"
    val df = spark.range(0, 300).select(
      col("id").as("k"), (col("id") % 10).as("grp"),
      col("id").cast("decimal(20,2)").as("qty"))
    PDataset.fromDataFrame(df, Seq("k")).writeParquet(src)
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"))
    ViewRewrite.register(spark, view)
    // sum(decimal) / avg(decimal) have decimal result types: the view
    // stores double partials, so the rewrite must decline rather than
    // silently round — the plan keeps scanning the source
    val q1 = spark.read.format("graft").load(src)
      .groupBy("grp").agg(sum("qty").as("s"))
    assert(scannedFiles(q1).forall(_.contains("/src")))
    val q2 = spark.read.format("graft").load(src)
      .groupBy("grp").agg(avg("qty").as("a"))
    assert(scannedFiles(q2).forall(_.contains("/src")))
    // count(col) carries no decimal hazard: it still fires
    val q3 = spark.read.format("graft").load(src)
      .groupBy("grp").agg(count(col("qty")).as("c"))
    assert(scannedFiles(q3).forall(_.contains("/view")))
  }

  test("min/max answer from a min/max-tracking view; others decline") {
    val root = tempDir("view-rewrite-mm")
    val src = root + "/src"
    val view = root + "/view"
    val parts = (0 until 400 by 100).map(lo =>
      PDataset.fromDataFrame(srcDF(lo.toLong, 100L), Seq("k")))
    PDataset.concat(parts).writeParquet(src)
    IncrementalAgg.build(spark, src, view, Seq("grp"), Seq("qty"),
      minMaxCols = Seq("qty"))
    ViewRewrite.register(spark, view)
    val q = spark.read.format("graft").load(src)
      .groupBy("grp").agg(min("qty").as("lo"), max("qty").as("hi"),
        count(lit(1)).as("n"))
    assert(scannedFiles(q).forall(_.contains("/view")))
    val want = srcDF(0, 400).groupBy("grp")
      .agg(min("qty").as("lo"), max("qty").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(q.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getLong(3))).sortBy(_._1).toSeq == want)
    // a view NOT tracking min/max declines the same shape: the main
    // fixture's view has no minMaxCols
    val (mainSrc, _) = dirs
    val q2 = spark.read.format("graft").load(mainSrc)
      .groupBy("grp").agg(min("qty"))
    assert(scannedFiles(q2).forall(_.contains("/src")))
    // a count-only query on the min/max view reads ONLY grp and n:
    // the rewrite narrows the scan so unused view columns never load
    val q3 = spark.read.format("graft").load(src)
      .groupBy("grp").agg(count(lit(1)).as("n_rows"))
    assert(scannedFiles(q3).forall(_.contains("/view")))
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val p3 = (q3.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val readCols = p3.output.map(_.name).toSet
    assert(readCols == Set("grp", "n"),
      s"view scan must prune to grp,n — read $readCols")
  }

  test("a filter on group columns pushes through onto the view") {
    val (src, _) = dirs
    val q = spark.read.format("graft").load(src)
      .filter(col("grp") < 5 && col("bucket") =!= 2)
      .groupBy("grp", "bucket").agg(count(lit(1)).as("n_rows"))
    assert(scannedFiles(q).forall(_.contains("/view")))
    val want = srcDF(0, 800)
      .filter(col("grp") < 5 && col("bucket") =!= 2)
      .groupBy("grp", "bucket").agg(count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).sortBy(t => (t._1, t._2)).toSeq == want)
  }

  test("stacked group-column filters fold conjunctively and fire") {
    val (src, view) = dirs
    // The optimizer usually collapses adjacent Filters before user
    // rules run — apply the rule straight to the ANALYZED plan, where
    // the two .filter calls are still distinct nodes, to pin that
    // matchScan folds them instead of declining on the second one.
    val q = spark.read.format("graft").load(src)
      .filter(col("grp") < 5).filter(col("bucket") =!= 2)
      .groupBy("grp", "bucket").agg(count(lit(1)).as("n_rows"))
    val analyzed = q.queryExecution.analyzed
    val stacked = analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(stacked.length == 2, s"fixture must stack two Filters:\n$analyzed")
    val rewritten = new graft.plans.ViewRewrite(spark, view)(analyzed)
    val scans = rewritten.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.toSeq
    }.flatten
    assert(scans.nonEmpty && scans.forall(_.contains("/view")),
      s"stacked filters must still rewrite to the view:\n$rewritten")
    // and both predicates survive: the rewritten plan keeps a Filter
    // referencing both group columns
    val conds = rewritten.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.references.map(_.name).toSet
    }
    assert(conds.exists(_ == Set("grp", "bucket")),
      s"folded filter must keep both predicates, saw $conds")
  }

  test("global count over a no-rows rewrite is 0, not sum's NULL") {
    val (src, _) = dirs
    // a group-column filter matching NOTHING: the rewritten global
    // count aggregates an empty view subset — count semantics demand
    // 0 where a bare sum(n) would produce NULL
    val q = spark.read.format("graft").load(src)
      .filter(col("grp") < 0)
      .agg(count(lit(1)).as("n_rows"))
    assert(scannedFiles(q).forall(_.contains("/view")))
    val rows = q.collect()
    assert(rows.length == 1 && !rows.head.isNullAt(0) &&
      rows.head.getLong(0) == 0L)
  }

  test("shapes the view cannot answer are left alone") {
    val (src, _) = dirs
    // count over an UNtracked column; distinct; untracked groupings
    val q1 = spark.read.format("graft").load(src)
      .groupBy("grp").agg(count(col("k")))
    assert(scannedFiles(q1).forall(_.contains("/src")))
    val q2 = spark.read.format("graft").load(src)
      .groupBy("k").agg(sum("qty"))
    assert(scannedFiles(q2).forall(_.contains("/src")))
    val q3 = spark.read.format("graft").load(src)
      .groupBy("grp").agg(sum_distinct(col("qty")))
    assert(scannedFiles(q3).forall(_.contains("/src")))
    // a filter on a NON-group column reaches into groups: the view
    // cannot answer it
    val q4 = spark.read.format("graft").load(src).filter(col("k") < 100)
      .groupBy("grp").agg(count(lit(1)))
    assert(scannedFiles(q4).forall(_.contains("/src")))
  }

  test("stale view declines; refresh restores the rewrite") {
    val (src, view) = dirs
    // force dependence on prior fixtures having run
    spark.read.format("graft").load(src).count()
    Maintenance.upsert(spark, src,
      srcDF(100, 1).withColumn("qty", lit(100.0)), retain = true)
    val q = () => spark.read.format("graft").load(src)
      .groupBy("grp").agg(sum("qty").as("total"))
    assert(scannedFiles(q()).forall(_.contains("/src")),
      "stale view must not be used")
    // correctness while stale comes from the source
    val live = q().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    IncrementalAgg.refresh(spark, view)
    assert(scannedFiles(q()).forall(_.contains("/view")),
      "refreshed view must be used again")
    assert(q().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      == live)
  }

  test("time-travel scans of an old generation never rewrite") {
    val (src, _) = dirs
    // dirs' source may have been mutated by the staleness test; any
    // archived generation's file set differs from the current one
    val versions = Maintenance.versions(spark, src)
    assume(versions.nonEmpty)
    val q = spark.read.format("graft")
      .option("version", versions.head.toString).load(src)
      .groupBy("grp").agg(count(lit(1)))
    assert(scannedFiles(q).forall(_.contains("/src")),
      "an old generation must aggregate its own files")
  }
}
