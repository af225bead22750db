package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.core.PDataset
import Fixtures._

/** The automatic zero-Exchange SQL division window
  * (`graft.plans.SqlDivisionWindow`): window functions PARTITION BY'd
  * on a prefix of a graft table's index columns rewrite to a union of
  * per-division Window nodes — no shuffle of the (row-preserving)
  * window input — while non-eligible shapes (non-index partitioning,
  * global windows, rule disabled) keep Spark's plan. */
class SqlDivisionWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Same layout as SqlDivisionAggSpec: files of 20, index (k) with
    * k = id/3, so key values straddle file boundaries and the rewrite
    * must route window partitions by value, not by file. */
  private def writeClustered(dir: String, n: Long): Unit = {
    def part(lo: Long): PDataset =
      PDataset.fromDataFrame(
        spark.range(lo, math.min(lo + 20, n)).select(
          (col("id") / 3).cast("long").as("k"),
          col("id").as("v"),
          (col("id") % 7).as("w")), Seq("k"))
    PDataset.concat((0L until n by 20L).map(part)).writeParquet(dir)
  }

  private def plans(df: DataFrame): (String, String) =
    (df.queryExecution.optimizedPlan.toString,
      df.queryExecution.executedPlan.toString)

  private def withRuleOff[A](body: => A): A = {
    spark.conf.set("spark.graft.sql.divisionWindow", "false")
    try body
    finally spark.conf.set("spark.graft.sql.divisionWindow", "true")
  }

  test("PARTITION BY the clustered key plans Exchange-free and " +
      "matches Spark's plan across functions and frames") {
    PDataset.divisionJoinMinOverride = Some(2)
    spark.conf.set("spark.graft.sql.divisionMinBytes", "0")
    try {
      val dir = tempDir("sqldivwin") + "/ds"
      writeClustered(dir, 160) // 8 files
      spark.read.format("graft").load(dir).createOrReplaceTempView("dvw")

      val q = """SELECT k, v,
                        row_number() OVER
                          (PARTITION BY k ORDER BY v DESC) AS rk,
                        sum(v) OVER (PARTITION BY k) AS sv,
                        avg(v) OVER (PARTITION BY k ORDER BY v
                          ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS mv
                 FROM dvw"""
      val df = spark.sql(q)
      val (opt, exec) = plans(df)
      assert(opt.contains("Union"), opt)
      assert(!exec.contains("Exchange"), exec)
      val got = df.orderBy("k", "v").collect().toSeq
      val want = withRuleOff(
        spark.sql(q).orderBy("k", "v").collect().toSeq)
      assert(got == want)
      assert(got.length == 160)

      // extra partition expressions make partitions FINER — still
      // division-contained
      val q2 = """SELECT k, w, v, rank() OVER
                    (PARTITION BY k, w ORDER BY v) AS r FROM dvw"""
      val df2 = spark.sql(q2)
      assert(plans(df2)._1.contains("Union"), plans(df2)._1)
      assert(!plans(df2)._2.contains("Exchange"), plans(df2)._2)
      assert(df2.orderBy("k", "w", "v").collect().toSeq ==
        withRuleOff(
          spark.sql(q2).orderBy("k", "w", "v").collect().toSeq))

      // ineligible: partitioning on a non-index column
      val dfN = spark.sql("SELECT v, row_number() OVER " +
        "(PARTITION BY w ORDER BY v) AS r FROM dvw")
      assert(!plans(dfN)._1.contains("Union"), plans(dfN)._1)

      // ineligible: a global window (no PARTITION BY)
      val dfG = spark.sql(
        "SELECT v, row_number() OVER (ORDER BY v) AS r FROM dvw")
      assert(!plans(dfG)._1.contains("Union"), plans(dfG)._1)

      // disabled by conf (plan forced while the conf is off)
      val offOpt = withRuleOff(plans(spark.sql(q))._1)
      assert(!offOpt.contains("Union"), offOpt)
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.unset("spark.graft.sql.divisionMinBytes")
    }
  }

  test("the q_sql_division_window entry query really plans the " +
      "zero-Exchange division window") {
    val df = SparkEntry.queries("q_sql_division_window")(
      spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("Union"), opt)
    assert(!df.queryExecution.executedPlan.toString
      .contains("hashpartitioning(ckey"),
      df.queryExecution.executedPlan.toString)
  }
}
