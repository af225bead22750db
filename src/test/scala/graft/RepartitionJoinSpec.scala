package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Lex, PDataset}
import Fixtures._

/** M4+M5: repartition (index + row modes, fast write) and join
  * (ports of tests/test_repartition.py and tests/test_join.py). */
class RepartitionJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val dir: String = {
    val d = tempDir("graft-repart")
    writeDatetimeSample(spark, d)
    d
  }
  def indexed: PDataset =
    PDataset.scanParquet(spark, dir).reindex(datetimeIndexColumns)

  test("index divisions match the reference unit vector") {
    // tests/test_repartition.py:56-87: hour index, 24 rows/partition
    val ds = indexed.reindex(Seq("hour"))
    val rp = ds.repartition(24, Seq("hour"))
    assert(rp.npartitions == 5)
    assert(rp.sizes.get == Vector(22L, 24L, 24L, 24L, 4L))
    assert(rp.lowerBounds.get ==
      (Vector(None: Option[Any]) +: (5 until 24 by 6).map(h => b(hrs(h))).toVector))
    assert(rp.upperBounds.get ==
      ((4 until 24 by 6).map(h => b(hrs(h))).toVector :+ b(hrs(23))))
    checkBoundsAndSizes(rp)
    assertSameRows(rp.toDF, indexed.toDF)
  }

  test("repartition by full index keeps all rows, disjoint partitions") {
    val rp = indexed.repartition(30)
    assert(rp.isDisjoint)
    assert(rp.sizes.get.sum == 98)
    checkBoundsAndSizes(rp)
    assertSameRows(rp.toDF, indexed.toDF)
  }

  test("repartition + writeParquet takes the one-shuffle fast path") {
    val out = tempDir("graft-fastwrite") + "/ds.parquet"
    val back = indexed.repartition(30).writeParquet(out)
    assert(back.npartitions == indexed.repartition(30).npartitions)
    assert(back.sizes.get.sum == 98)
    assert(back.isDisjoint)
    checkBoundsAndSizes(back)
    assertSameRows(back.toDF, indexed.toDF)
  }

  test("row-mode repartition splits by row counts deterministically") {
    val plain = PDataset.scanParquet(spark, dir).reindex(Seq.empty)
    val rp = plain.repartition(40)
    assert(rp.npartitions == 3)
    assert(rp.sizes.get == Vector(40L, 40L, 18L))
    assertSameRows(rp.toDF, indexed.toDF)
    // each partition materializes with exactly its declared size
    (0 until rp.npartitions).foreach { i =>
      assert(rp(i).count() == rp.sizes.get(i))
    }
  }

  test("row-mode slicing stays parallel (no single-task coalesce)") {
    val df = spark.range(0, 1000, 1, 8).select(col("id"))
    val ds = PDataset.fromDataFrame(df).repartition(300)
    assert(ds.npartitions == 4)
    assert(ds.sizes.get == Vector(300L, 300L, 300L, 100L))
    // boundary slices keep the parent's 8-task layout, not coalesce(1)
    (0 until ds.npartitions).foreach { i =>
      assert(ds(i).rdd.getNumPartitions == 8,
        s"partition $i collapsed to a single task")
    }
    // global row order respected: partition i holds ids [300i, 300i+size)
    (0 until ds.npartitions).foreach { i =>
      val ids = ds(i).collect().map(_.getLong(0)).toSet
      val lo = 300L * i
      assert(ids == (lo until math.min(lo + 300L, 1000L)).toSet,
        s"partition $i has wrong rows")
    }
  }

  test("repartition of an all-empty (but partitioned) dataset survives") {
    val empty = indexed.mapPartitionsP(df => df.filter(lit(false)),
      preserves = "none").reindex(Seq("hour"), collectStats = false)
    // bounds unknown -> declare via a no-stats reindex, then repartition
    val filtered = indexed.slice(b(dt("2030-01-01")), null) // prunes all
    assert(filtered.npartitions == 0)
    val rp = filtered // 0-partition dataset: repartition is identity
      .repartition(10)
    assert(rp.npartitions == 0)
  }

  test("repartition when every row is filtered upstream gives one empty partition") {
    val noRows = indexed.mapPartitionsP(df => df.filter(lit(false)),
      preserves = "bounds")
    val rp = noRows.repartition(10, Seq("hour"))
    assert(rp.npartitions == 1)
    assert(rp.toDF.count() == 0)
  }

  test("high-cardinality index auto-degrades to bounded sampling") {
    val old = PDataset.maxHistogramEntries
    try {
      PDataset.maxHistogramEntries = 32L
      // "t" is near-unique (96 distinct + nulls) > 32: the exact path
      // would collect one histogram row per distinct value; the guard
      // must switch to sampling (stats unknown) and stay correct.
      val rp = PDataset.scanParquet(spark, dir).reindex(Seq("t"))
        .repartition(30)
      assert(!rp.knownSizes, "expected degraded (sampling) planning")
      assertSameRows(rp.toDF, indexed.toDF)
    } finally PDataset.maxHistogramEntries = old
  }

  test("sample_fraction < 1 leaves stats unknown but partitions correct") {
    val rp = indexed.repartition(30, sampleFraction = 0.5)
    assert(!rp.knownSizes)
    assertSameRows(rp.toDF, indexed.toDF)
  }

  // ---- join (tests/test_join.py) ----

  lazy val dateDir: String = {
    val d = tempDir("graft-datesample")
    writeDateSample(spark, d)
    d
  }

  def leftDs: PDataset = indexed.reindex(Seq("date"))
  def rightDs: PDataset =
    PDataset.scanParquet(spark, dateDir).reindex(Seq("date"))

  def oracle(how: String) = {
    val l = indexed.toDF
    val r = PDataset.scanParquet(spark, dateDir).toDF
    l.join(r, Seq("date"), how)
  }

  /** Union of the per-division partitions — the division machinery
    * itself, bypassing the whole-frame toDF fast path. */
  def unionOfDivisions(j: PDataset) =
    (0 until j.npartitions).map(j(_)).reduceLeft(_.union(_))

  test("inner join on index columns matches whole-frame join") {
    val j = leftDs.join(rightDs, "inner")
    assert(!j.knownSizes)
    assertSameRows(j.toDF, oracle("inner"))
    assertSameRows(unionOfDivisions(j), oracle("inner"))
  }

  test("left join matches whole-frame join") {
    val j = leftDs.join(rightDs, "left")
    assertSameRows(j.toDF, oracle("left"))
    assertSameRows(unionOfDivisions(j), oracle("left"))
  }

  test("full join matches whole-frame join") {
    val j = leftDs.join(rightDs, "full")
    assertSameRows(j.toDF, oracle("full"))
    assertSameRows(unionOfDivisions(j), oracle("full"))
  }

  test("semi and anti joins match whole-frame joins, emit the left " +
      "schema only, and plan the zero-Exchange division node") {
    for (how <- Seq("semi", "anti")) {
      val j = leftDs.join(rightDs, how)
      val sqlHow = if (how == "semi") "left_semi" else "left_anti"
      assert(j.toDF.columns.toSeq == leftDs.toDF.columns.toSeq,
        s"$how join must carry the left schema")
      assertSameRows(j.toDF, oracle(sqlHow))
      assertSameRows(unionOfDivisions(j), oracle(sqlHow))
    }
    PDataset.divisionJoinMinOverride = Some(2)
    try {
      val df = leftDs.join(rightDs, "anti").toDF
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("DivisionJoin"), physical)
      assert(!physical.contains("Exchange"), physical)
    } finally PDataset.divisionJoinMinOverride = None
  }

  test("joined toDF plans one shuffle-free division join, no Exchange") {
    PDataset.divisionJoinMinOverride = Some(2)
    try {
      val df = leftDs.join(rightDs, "inner").toDF
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("DivisionJoin"), optimized)
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("DivisionJoin"), physical)
      assert(!physical.contains("Exchange"),
        s"division join must not shuffle:\n$physical")
    } finally PDataset.divisionJoinMinOverride = None
  }

  test("division join shape survives AQE re-planning (final plan)") {
    // The whole suite runs with spark.sql.adaptive.enabled=true, but
    // pre-execution executedPlan pins only see AQE's INITIAL plan;
    // this pin executes the query and asserts the FINAL adaptive plan
    // — what a real cluster runs — still shows the custom node and no
    // injected Exchange.
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    PDataset.divisionJoinMinOverride = Some(2)
    try {
      val df = leftDs.join(rightDs, "inner").toDF
      df.collect()
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val finalPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val s = finalPlan.toString
      assert(s.contains("DivisionJoin"),
        s"final AQE plan lost the division join:\n$s")
      assert(!s.contains("Exchange"),
        s"AQE re-planning injected a shuffle:\n$s")
    } finally PDataset.divisionJoinMinOverride = None
  }

  test("division join builds the smaller side when sizes are known") {
    PDataset.divisionJoinMinOverride = Some(2)
    try {
      // left (4 rows) is smaller than right (98 rows): the whole-frame
      // plan must swap so the small side lands on the node's build
      // (last nDiv children), while the public column order stays the
      // left-join USING order.
      val df = rightDs.join(leftDs, "inner").toDF
      val execs = df.queryExecution.executedPlan.collect {
        case e: graft.plans.DivisionJoinExec => e
      }
      assert(execs.nonEmpty, df.queryExecution.executedPlan.toString)
      val e = execs.head
      val buildCols = e.children.drop(e.nDiv).flatMap(_.output.map(_.name)).toSet
      assert(buildCols.contains("x"),
        s"expected the 4-row side on build, saw columns $buildCols")
      assert(df.columns.toSeq == Seq("date", "x", "t", "hour", "a"))
      val want = PDataset.scanParquet(spark, dateDir).toDF
        .join(indexed.toDF, Seq("date"), "inner")
      assertSameRows(df, want)
      // full joins are side-symmetric too and may swap
      val full = rightDs.join(leftDs, "full").toDF
      val wantFull = PDataset.scanParquet(spark, dateDir).toDF
        .join(indexed.toDF, Seq("date"), "full")
      assertSameRows(full, wantFull)
    } finally PDataset.divisionJoinMinOverride = None
  }

  test("oversized division build side spills and stays correct") {
    import graft.plans.DivisionJoinExec
    PDataset.divisionJoinMinOverride = Some(2)
    val oldThreshold = DivisionJoinExec.buildSpillThresholdBytes
    // a few hundred bytes: every division's build side overflows, so
    // the whole join (null keys included) runs through the Grace path
    DivisionJoinExec.buildSpillThresholdBytes = 300L
    try {
      // equal-size sides (98 rows each, renamed to avoid duplicate
      // columns) so the size-aware swap cannot shrink the build side;
      // the null-date row exercises the spilled null-key files too
      val renames = Map("t" -> "t2", "hour" -> "hour2", "a" -> "a2")
      Seq("inner", "left", "full").foreach { how =>
        DivisionJoinExec.spillCount.set(0L)
        val df = leftDs.join(leftDs.rename(renames), how).toDF
        val want = indexed.toDF.join(
          indexed.toDF.withColumnsRenamed(renames), Seq("date"), how)
        assertSameRows(df, want)
        assert(DivisionJoinExec.spillCount.get > 0,
          s"$how: expected the spill path to engage")
      }
    } finally {
      DivisionJoinExec.buildSpillThresholdBytes = oldThreshold
      PDataset.divisionJoinMinOverride = None
    }
  }

  test("above the task cap adjacent divisions merge into bounded range slices") {
    import graft.plans.DivisionJoinExec
    PDataset.divisionJoinMinOverride = Some(2)
    PDataset.divisionJoinMaxOverride = Some(3)
    try {
      Seq("inner", "left", "full").foreach { how =>
        val df = leftDs.join(rightDs, how).toDF
        val execs = df.queryExecution.executedPlan.collect {
          case e: DivisionJoinExec => e
        }
        assert(execs.nonEmpty, s"$how: expected the custom node")
        assert(execs.head.nDiv == 3,
          s"$how: expected 3 merged ranges, got ${execs.head.nDiv}")
        assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
        assertSameRows(df, oracle(how))
      }
    } finally {
      PDataset.divisionJoinMaxOverride = None
      PDataset.divisionJoinMinOverride = None
    }
  }

  test("a task cap below the minimum disables the custom node (Catalyst join)") {
    PDataset.divisionJoinMaxOverride = Some(0)
    try {
      val df = leftDs.join(rightDs, "inner").toDF
      val plan = df.queryExecution.optimizedPlan.toString
      assert("Join ".r.findAllIn(plan).length == 1, plan)
      assertSameRows(df, oracle("inner"))
    } finally PDataset.divisionJoinMaxOverride = None
  }

  test("join rejects duplicate non-key columns and bad how") {
    intercept[IllegalArgumentException](leftDs.join(leftDs, "inner"))
    intercept[IllegalArgumentException](leftDs.join(rightDs, "cross"))
  }

  test("join requires matching index columns") {
    intercept[IllegalArgumentException](
      indexed.join(rightDs, "inner"))
  }
}
