package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.core.PDataset
import Fixtures._

/** The automatic zero-Exchange SQL division sort
  * (`graft.plans.SqlDivisionSort`): a global ORDER BY leading with
  * the clustering order replaces Spark's RangePartitioning Exchange +
  * full sort with locally sorted range slices concatenated in range
  * order; ORDER BY ... LIMIT reads only the first key band. */
class SqlDivisionSortSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Files of 20, index (k), k = id/3 — duplicate keys straddling
    * file boundaries, plus a nulls-first file. */
  private def writeClustered(dir: String, n: Long): Unit = {
    def part(lo: Long): PDataset =
      PDataset.fromDataFrame(
        spark.range(lo, math.min(lo + 20, n)).select(
          when(col("id") < 2, lit(null)).otherwise(col("id") / 3)
            .cast("long").as("k"),
          col("id").as("v")), Seq("k"))
    PDataset.concat((0L until n by 20L).map(part)).writeParquet(dir)
  }

  private def plans(df: DataFrame): (String, String) =
    (df.queryExecution.optimizedPlan.toString,
      df.queryExecution.executedPlan.toString)

  private def withRuleOff[A](body: => A): A = {
    spark.conf.set("spark.graft.sql.divisionSort", "false")
    try body
    finally spark.conf.set("spark.graft.sql.divisionSort", "true")
  }

  test("ORDER BY the clustering prefix plans Exchange-free and " +
      "returns the exact global order; LIMIT reads the first band") {
    PDataset.divisionJoinMinOverride = Some(2)
    spark.conf.set("spark.graft.sql.divisionMinBytes", "0")
    try {
      val dir = tempDir("sqldivsort") + "/ds"
      writeClustered(dir, 160)
      spark.read.format("graft").load(dir).createOrReplaceTempView("dvs")

      // extra entries beyond the prefix sort locally (tie-break by v)
      val q = "SELECT k, v FROM dvs ORDER BY k, v DESC"
      val df = spark.sql(q)
      val (opt, exec) = plans(df)
      assert(opt.contains("Union"), opt)
      assert(!exec.contains("Exchange"), exec)
      val got = df.collect().toSeq
      val want = withRuleOff(spark.sql(q).collect().toSeq)
      assert(got == want) // EXACT row order, nulls first
      assert(got.length == 160 && got.head.isNullAt(0))

      // ORDER BY ... LIMIT: no Exchange, correct top-n
      val ql = "SELECT k, v FROM dvs ORDER BY k, v LIMIT 7"
      val dfl = spark.sql(ql)
      assert(plans(dfl)._1.contains("Union"), plans(dfl)._1)
      assert(!plans(dfl)._2.contains("Exchange"), plans(dfl)._2)
      assert(dfl.collect().toSeq ==
        withRuleOff(spark.sql(ql).collect().toSeq))

      // ineligible: mixed prefix directions, DESC NULLS FIRST (not
      // the reversed clustering order), non-index leading entry,
      // rule off — all keep Spark's plan
      val offShapes = Seq(
        "SELECT k, v FROM dvs ORDER BY k DESC NULLS FIRST",
        "SELECT k, v FROM dvs ORDER BY v")
      offShapes.foreach { shape =>
        assert(!plans(spark.sql(shape))._1.contains("Union"),
          shape + "\n" + plans(spark.sql(shape))._1)
      }
      val offOpt = withRuleOff(plans(spark.sql(q))._1)
      assert(!offOpt.contains("Union"), offOpt)
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.unset("spark.graft.sql.divisionMinBytes")
    }
  }

  test("ORDER BY ... DESC tiles in reverse: exact global descending " +
      "order, nulls last, and DESC LIMIT reads only the top band") {
    PDataset.divisionJoinMinOverride = Some(2)
    spark.conf.set("spark.graft.sql.divisionMinBytes", "0")
    try {
      val dir = tempDir("sqldivsort-desc") + "/ds"
      writeClustered(dir, 160) // nulls live in the LOWEST band
      spark.read.format("graft").load(dir)
        .createOrReplaceTempView("dvs_desc")

      val q = "SELECT k, v FROM dvs_desc ORDER BY k DESC, v"
      val df = spark.sql(q)
      val (opt, exec) = plans(df)
      assert(opt.contains("Union"), opt)
      assert(!exec.contains("Exchange"), exec)
      val got = df.collect().toSeq
      val want = withRuleOff(spark.sql(q).collect().toSeq)
      assert(got == want) // EXACT row order, nulls LAST
      assert(got.length == 160 && got.last.isNullAt(0) &&
        !got.head.isNullAt(0))

      // "latest N": DESC LIMIT pulls from the TOP band only
      val ql = "SELECT k, v FROM dvs_desc ORDER BY k DESC, v DESC LIMIT 5"
      val dfl = spark.sql(ql)
      assert(plans(dfl)._1.contains("Union"), plans(dfl)._1)
      assert(!plans(dfl)._2.contains("Exchange"), plans(dfl)._2)
      assert(dfl.collect().toSeq ==
        withRuleOff(spark.sql(ql).collect().toSeq))
      // the limit must not read the whole table: CollectLimit
      // consumes union partitions in order, and the FIRST partitions
      // now hold the TOP keys — so only the top band's rows are read
      val rows = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            rows.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(l)
      try {
        spark.sql(ql).collect()
        org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
      } finally spark.sparkContext.removeSparkListener(l)
      assert(rows.get() <= 60,
        s"DESC LIMIT 5 read ${rows.get()} of 160 rows — the reversed " +
          "tiling must let CollectLimit stop at the top band")
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.unset("spark.graft.sql.divisionMinBytes")
    }
  }

  test("the q_sql_division_sort_desc entry query really plans the " +
      "reversed zero-Exchange division sort") {
    val df = SparkEntry.queries("q_sql_division_sort_desc")(
      spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("Union"), opt)
    assert(!df.queryExecution.executedPlan.toString
      .contains("rangepartitioning(ckey"),
      df.queryExecution.executedPlan.toString)
  }

  test("the q_sql_division_sort entry query really plans the " +
      "zero-Exchange division sort") {
    val df = SparkEntry.queries("q_sql_division_sort")(
      spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("Union"), opt)
    assert(!df.queryExecution.executedPlan.toString
      .contains("rangepartitioning(ckey"),
      df.queryExecution.executedPlan.toString)
  }
}
