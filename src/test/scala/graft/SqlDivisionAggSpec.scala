package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.core.PDataset
import Fixtures._

/** The automatic zero-Exchange SQL division aggregate
  * (`graft.plans.SqlDivisionAgg`): a GROUP BY on a prefix of a graft
  * table's index columns rewrites to a union of per-division complete
  * aggregates — no shuffle, any aggregate function — while every
  * non-eligible shape (non-index grouping, global aggregates,
  * metadata-foldable plans, too few divisions, rule disabled) keeps
  * Spark's plan. */
class SqlDivisionAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** n rows in files of 20, index (k) with k = id/3 — every third key
    * value STRADDLES a file boundary (20 % 3 != 0), so the rewrite
    * must route groups by value, not by file. */
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
    spark.conf.set("spark.graft.sql.divisionAgg", "false")
    try body
    finally spark.conf.set("spark.graft.sql.divisionAgg", "true")
  }

  test("GROUP BY on the clustered key plans Exchange-free and matches " +
      "Spark's plan, including non-algebraic aggregates") {
    PDataset.divisionJoinMinOverride = Some(2)
    spark.conf.set("spark.graft.sql.divisionMinBytes", "0")
    try {
      val dir = tempDir("sqldivagg") + "/ds"
      writeClustered(dir, 160) // 8 files
      spark.read.format("graft").load(dir).createOrReplaceTempView("dva")

      // exact median and a collected list — aggregates a partial/final
      // split can't always express; division-complete groups can
      val q = """SELECT k, count(*) AS n, sum(v) AS sv,
                        percentile(v, 0.5) AS med,
                        sort_array(collect_list(w)) AS ws
                 FROM dva GROUP BY k"""
      val df = spark.sql(q)
      val (opt, exec) = plans(df)
      assert(opt.contains("Union"), opt)
      assert(!exec.contains("Exchange"), exec)
      val got = df.orderBy("k").collect().toSeq
      val want = withRuleOff(spark.sql(q).orderBy("k").collect().toSeq)
      assert(got == want)
      assert(got.length == 54, s"${got.length} groups") // ceil(160/3)

      // extra grouping expressions make groups FINER — still contained
      val q2 = "SELECT k, v % 2 AS par, count(*) AS n FROM dva " +
        "GROUP BY k, v % 2"
      val df2 = spark.sql(q2)
      assert(plans(df2)._1.contains("Union"), plans(df2)._1)
      val exec2 = plans(df2)._2
      assert(!exec2.contains("Exchange"), exec2)
      // column pruning reaches the scan through the coalesce: the
      // unused w column must not be read
      assert(exec2.contains("ReadSchema") && !exec2.contains("w:bigint"),
        exec2)
      assert(df2.orderBy("k", "par").collect().toSeq ==
        withRuleOff(spark.sql(q2).orderBy("k", "par").collect().toSeq))

      // filters above the scan survive; DISTINCT aggregates work
      val q3 = "SELECT k, count(DISTINCT w) AS dw FROM dva " +
        "WHERE v >= 30 GROUP BY k"
      val df3 = spark.sql(q3)
      assert(plans(df3)._1.contains("Union"), plans(df3)._1)
      assert(!plans(df3)._2.contains("Exchange"), plans(df3)._2)
      assert(df3.orderBy("k").collect().toSeq ==
        withRuleOff(spark.sql(q3).orderBy("k").collect().toSeq))

      // SELECT DISTINCT on the key is an Aggregate by the time the
      // rule runs (ReplaceDistinctWithAggregate) — dedup on the
      // clustered key is shuffle-free too
      val qd = "SELECT DISTINCT k, v % 3 AS m3 FROM dva"
      val dfd = spark.sql(qd)
      assert(plans(dfd)._1.contains("Union"), plans(dfd)._1)
      assert(!plans(dfd)._2.contains("Exchange"), plans(dfd)._2)
      assert(dfd.orderBy("k", "m3").collect().toSeq ==
        withRuleOff(spark.sql(qd).orderBy("k", "m3").collect().toSeq))

      // ineligible: grouping on a non-index column keeps Spark's plan
      val dfN = spark.sql("SELECT w, count(*) AS n FROM dva GROUP BY w")
      assert(!plans(dfN)._1.contains("Union"), plans(dfN)._1)

      // ineligible: a global aggregate keeps Spark's plan
      // (count(*) folds metadata-only to a LocalRelation)
      val dfG = spark.sql("SELECT sum(v) AS sv FROM dva")
      assert(!plans(dfG)._1.contains("Union"), plans(dfG)._1)

      // disabled by conf (plan forced while the conf is off — the
      // optimized plan is computed lazily)
      val offOpt = withRuleOff(plans(spark.sql(q))._1)
      assert(!offOpt.contains("Union"), offOpt)
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.unset("spark.graft.sql.divisionMinBytes")
    }
  }

  test("utilization gate: too few divisions for the cluster keeps " +
      "Spark's full-parallelism plan") {
    // minimum pinned above the fixture's 9 distinct prefix divisions
    // (byte floor pinned down so THIS gate is the one deciding)
    PDataset.divisionJoinMinOverride = Some(10)
    spark.conf.set("spark.graft.sql.divisionMinBytes", "0")
    try {
      val dir = tempDir("sqldivagg-min") + "/ds"
      writeClustered(dir, 160)
      spark.read.format("graft").load(dir)
        .createOrReplaceTempView("dva_min")
      val df = spark.sql(
        "SELECT k, count(*) AS n FROM dva_min GROUP BY k")
      assert(!plans(df)._1.contains("Union"), plans(df)._1)
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.unset("spark.graft.sql.divisionMinBytes")
    }
  }

  test("each division branch's scan prunes to its own files — the " +
      "property that makes a branch O(its band), not O(table)") {
    PDataset.divisionJoinMinOverride = Some(2)
    spark.conf.set("spark.graft.sql.divisionMinBytes", "0")
    try {
      val dir = tempDir("sqldivagg-prune") + "/ds"
      writeClustered(dir, 160) // 8 files
      spark.read.format("graft").load(dir)
        .createOrReplaceTempView("dva_prune")
      val df = spark.sql(
        "SELECT k, count(*) AS n FROM dva_prune GROUP BY k")
      df.collect()
      // Fixtures.collectScans descends AQE QueryStageExec LEAF
      // wrappers (incl. Spark 4's ResultQueryStage) that a plain
      // plan.collect cannot — without it this finds 0 scans.
      val scans = Fixtures.collectScans(df.queryExecution.executedPlan)
      assert(scans.length >= 8,
        s"${scans.length} branches\n${df.queryExecution.executedPlan}")
      val perScan = scans.map(f =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .map(_.files.length).sum)
      // ~1 file per branch; a file whose ub touches the next lower
      // bound is kept by both neighbors, never more
      assert(perScan.max <= 2, s"per-branch files: $perScan")
      assert(perScan.sum <= 2 * 8, s"total listed: ${perScan.sum}")
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.unset("spark.graft.sql.divisionMinBytes")
    }
  }

  test("null-bearing index tuples tile: rows null at a position " +
      "where a division bound holds a null are never dropped") {
    PDataset.divisionJoinMinOverride = Some(2)
    spark.conf.set("spark.graft.sql.divisionMinBytes", "0")
    try {
      val dir = tempDir("sqldivagg-nulls") + "/ds"
      // composite index (k, v); the first files hold NULL k, so the
      // interior division bounds carry a null element at position 0 —
      // the shape that made null-propagating equality drop rows from
      // every range (caught by DivisionRouterSpec via the internal
      // repartition histogram)
      import spark.implicits._
      def part(rows: Seq[(java.lang.Long, Long)]): PDataset =
        PDataset.fromDataFrame(rows.toDF("k", "v"), Seq("k", "v"))
      PDataset.concat(Seq(
        part(Seq((null, 1L), (null, 2L), (null, 3L))),
        part(Seq((null, 4L), (null, 5L), (0L: java.lang.Long, 1L))),
        part(Seq((0L: java.lang.Long, 2L), (1L: java.lang.Long, 1L))),
        part(Seq((2L: java.lang.Long, 1L), (2L: java.lang.Long, 2L)))
      )).writeParquet(dir)
      spark.read.format("graft").load(dir)
        .createOrReplaceTempView("dva_null")
      val q = "SELECT k, count(*) AS n, sum(v) AS sv FROM dva_null " +
        "GROUP BY k"
      val df = spark.sql(q)
      assert(plans(df)._1.contains("Union"), plans(df)._1)
      val got = df.orderBy(col("k").asc_nulls_first).collect().toSeq
      val want = withRuleOff(spark.sql(q)
        .orderBy(col("k").asc_nulls_first).collect().toSeq)
      assert(got == want, s"got $got\nwant $want")
      assert(got.head.isNullAt(0) && got.head.getLong(1) == 5L,
        s"the null group must hold all 5 null-keyed rows: $got")
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.unset("spark.graft.sql.divisionMinBytes")
    }
  }

  test("the q_sql_division_agg entry query really plans the " +
      "zero-Exchange division aggregate") {
    val df = SparkEntry.queries("q_sql_division_agg")(
      spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("Union"), opt)
    // the GROUP BY itself must not shuffle — no hashpartitioning
    // exchange on the group key (the final ORDER BY ... LIMIT plans
    // as TakeOrdered, also exchange-free)
    assert(!df.queryExecution.executedPlan.toString
      .contains("hashpartitioning(ckey"),
      df.queryExecution.executedPlan.toString)
  }

  test("a metadata-foldable grouped aggregate is left for the " +
      "sidecar-stats fold, not rewritten to a scan") {
    PDataset.divisionJoinMinOverride = Some(2)
    spark.conf.set("spark.graft.sql.divisionMinBytes", "0")
    try {
      val dir = tempDir("sqldivagg-meta") + "/ds"
      // k CONSTANT per file (lb == ub): the grouped count(*) answers
      // from the sidecar alone
      def part(k: Long): PDataset =
        PDataset.fromDataFrame(
          spark.range(k * 20, k * 20 + 20).select(
            lit(k).as("k"), col("id").as("v")), Seq("k"))
      PDataset.concat((0L until 6L).map(part)).writeParquet(dir)
      spark.read.format("graft").load(dir)
        .createOrReplaceTempView("dva_meta")
      val df = spark.sql(
        "SELECT k, count(*) AS n FROM dva_meta GROUP BY k")
      val opt = plans(df)._1
      assert(opt.contains("LocalRelation"), opt)
      assert(!opt.contains("Union"), opt)
      assert(df.orderBy("k").collect().map(_.getLong(1)).toSeq ==
        Seq.fill(6)(20L))
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.unset("spark.graft.sql.divisionMinBytes")
    }
  }

  test("division count tracks spark.graft.division.maxDivisions and " +
      "merged slices are byte-weighted, not count-weighted") {
    PDataset.divisionJoinMinOverride = Some(2)
    spark.conf.set("spark.graft.sql.divisionMinBytes", "0")
    try {
      val dir = tempDir("sqldivagg-conf") + "/ds"
      // 16 single-key files with SKEWED sizes: keys 0-11 tiny (5 rows),
      // keys 12-15 heavy (2000 rows with a fat payload) — ~98% of the
      // bytes live in the top quarter of the key space.
      def part(k: Long, rows: Long): PDataset =
        PDataset.fromDataFrame(
          spark.range(rows).select(
            lit(k).as("k"), col("id").as("v"),
            sha1(concat(lit(k), col("id").cast("string"))).as("pay")),
          Seq("k"))
      PDataset.concat(
        (0L until 16L).map(k => part(k, if (k < 12) 5 else 2000)))
        .writeParquet(dir)
      spark.read.format("graft").load(dir)
        .createOrReplaceTempView("dva_conf")
      val q = "SELECT k, count(*) AS n, sum(v) AS sv " +
        "FROM dva_conf GROUP BY k"

      // a UNIFORM table for the count pin (under byte skew, quantile
      // cuts legitimately dedupe to fewer slices — that's the point)
      val uniDir = tempDir("sqldivagg-conf-uni") + "/ds"
      writeClustered(uniDir, 160) // 8 equal files
      spark.read.format("graft").load(uniDir)
        .createOrReplaceTempView("dva_conf_uni")

      def branchScans(view: String, maxD: Int) = {
        spark.conf.set("spark.graft.division.maxDivisions",
          maxD.toString)
        val df = spark.sql(
          s"SELECT k, count(*) AS n, sum(v) AS sv FROM $view GROUP BY k")
        df.collect()
        Fixtures.collectScans(df.queryExecution.executedPlan)
      }
      try {
        // on uniform bytes the conf IS the branch count
        assert(branchScans("dva_conf_uni", 4).length == 4)
        assert(branchScans("dva_conf_uni", 8).length == 8)
        // byte-weighted cuts concentrate where the bytes are: with 4
        // slices over a table whose bytes sit in keys 12-15, at most
        // one slice may hold more than ~1/2 of the table's bytes — a
        // count-weighted merge (cuts at keys 4, 8, 12) puts ~all
        // bytes in the last slice.
        val scans = branchScans("dva_conf", 4)
        val bytes = scans.map(
          _.relation.location.sizeInBytes.toDouble).sorted
        val total = bytes.sum
        assert(bytes.last / total < 0.55,
          s"largest slice holds ${bytes.last / total} of the bytes " +
            s"(per-slice: ${bytes.mkString(", ")})")
        // correctness unchanged under the conf
        val got = spark.sql(q).orderBy("k").collect().map(_.toSeq)
        withRuleOff {
          val want = spark.sql(q).orderBy("k").collect().map(_.toSeq)
          assert(got.toSeq == want.toSeq)
        }
      } finally spark.conf.unset("spark.graft.division.maxDivisions")
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.unset("spark.graft.sql.divisionMinBytes")
    }
  }
}
