package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PDataset
import graft.operators.Maintenance
import Fixtures._

/** Metadata-only count(*): an unfiltered count over a graft relation
  * is answered from sidecar row counts with zero file reads; every
  * shape the sidecar can't answer exactly takes the normal path. */
class MetadataCountSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = tempDir("metacount") + "/ds"
    val parts = (0 until 600 by 100).map(lo =>
      PDataset.fromDataFrame(
        spark.range(lo.toLong, lo + 100L).select(
          col("id").as("k"), (col("id") % 7).as("grp")), Seq("k")))
    PDataset.concat(parts).writeParquet(d)
    d
  }

  private def planOf(df: DataFrame): String = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("unfiltered count(*) is a LocalTableScan — no file reads") {
    val q = spark.read.format("graft").load(dir).agg(count(lit(1)).as("n"))
    assert(q.collect().head.getLong(0) == 600L)
    val plan = planOf(q)
    assert(plan.contains("LocalTableScan") && !plan.contains("FileScan"),
      s"expected a metadata-only count:\n$plan")
  }

  test("sql COUNT(*) over a graft view answers from metadata too") {
    spark.read.format("graft").load(dir).createOrReplaceTempView("mc_ds")
    val q = spark.sql("SELECT count(*) AS n FROM mc_ds")
    assert(q.collect().head.getLong(0) == 600L)
    assert(planOf(q).contains("LocalTableScan"), planOf(q))
  }

  test("time-travel scans count THEIR generation from metadata") {
    Maintenance.deleteKeys(spark, dir, Seq(5L, 6L, 7L).toDF("k"),
      retain = true)
    val v = Maintenance.versions(spark, dir).max
    val old = spark.read.format("graft")
      .option("version", v.toString).load(dir).agg(count(lit(1)))
    assert(old.collect().head.getLong(0) == 600L)
    assert(planOf(old).contains("LocalTableScan"), planOf(old))
    val cur = spark.read.format("graft").load(dir).agg(count(lit(1)))
    assert(cur.collect().head.getLong(0) == 597L)
    assert(planOf(cur).contains("LocalTableScan"), planOf(cur))
  }

  test("filtered, grouped, and stats-less count(col) take the normal path") {
    val rel = spark.read.format("graft").load(dir)
    val filtered = rel.filter(col("k") < 100).agg(count(lit(1)))
    assert(!planOf(filtered).contains("LocalTableScan"))
    assert(filtered.collect().head.getLong(0) == 97L) // 3 keys deleted
    val grouped = rel.groupBy("grp").agg(count(lit(1)))
    assert(!planOf(grouped).contains("LocalTableScan"))
    // grp carries no column stats here, so count(col) must scan
    val countCol = rel.agg(count(col("grp")))
    assert(!planOf(countCol).contains("LocalTableScan"))
    assert(countCol.collect().head.getLong(0) == 597L)
  }

  test("min/max/count(col) answer from column stats with zero reads") {
    val d = tempDir("metaminmax") + "/ds"
    val df = spark.range(0L, 500L).select(
      col("id").as("k"),
      when(col("id") % 5 === 0, lit(null).cast("long"))
        .otherwise(col("id") * 3).as("v"),
      concat(lit("s"), lpad(col("id").cast("string"), 4, "0")).as("s"))
    PDataset.fromDataFrame(df, Seq("k")).repartition(100).writeParquet(d)
    graft.core.ColumnStats.build(spark, d, Seq("v", "s"))
    val q = spark.read.format("graft").load(d).agg(
      min(col("v")).as("v_min"), max(col("v")).as("v_max"),
      count(col("v")).as("v_n"), max(col("s")).as("s_max"),
      sum(col("v")).as("v_sum"), count(lit(1)).as("n"))
    val r = q.collect().head
    // min/max ignore the nulls (multiples of 3 except 0: min is 3)
    assert(r.getLong(0) == 3L && r.getLong(1) == 1497L)
    assert(r.getLong(2) == 400L && r.getString(3) == "s0499")
    // sum over non-null v: 3 * (sum of ids not divisible by 5)
    assert(r.getLong(4) == 3L * (0L until 500L).filter(_ % 5 != 0).sum)
    assert(r.getLong(5) == 500L)
    assert(planOf(q).contains("LocalTableScan"), planOf(q))
    // an engine-native append records no stats entry for its new
    // file: coverage is incomplete and the rule declines rather than
    // answer from stale metadata
    val more = spark.range(500L, 510L).select(
      col("id").as("k"), (col("id") * 3).as("v"), lit("zzz").as("s"))
    PDataset.fromDataFrame(more, Seq("k")).writeParquet(d, append = true)
    val q2 = spark.read.format("graft").load(d).agg(max(col("v")))
    assert(!planOf(q2).contains("LocalTableScan"))
    assert(q2.collect().head.getLong(0) == 1527L)
  }
}
