package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.PDataset
import Fixtures._

/** Regression: a projection ABOVE a multi-division join must not let
  * column pruning shrink divisions 1..n-1 to their key columns only
  * (their non-key attrs are not referenced anywhere — rows are emitted
  * under division 0's ids), which misaligned the emitted row layout.
  * The node claims every child column as a reference; the exec asserts
  * per-division width against the declared output. */
class DivisionJoinPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("projection above a multi-division renamed join stays aligned") {
    PDataset.divisionJoinMinOverride = Some(2)
    try {
    val dir = tempDir("divprune")
    writeDatetimeSample(spark, dir)
    val dateDir = tempDir("divprune-date")
    writeDateSample(spark, dateDir)
    val l = PDataset.scanParquet(spark, dir)
      .rename(Map("date" -> "d")).reindex(Seq("d"))
    val r = PDataset.scanParquet(spark, dateDir)
      .rename(Map("date" -> "d")).reindex(Seq("d"))
    val j = l.join(r, "inner").toDF
    assert(j.queryExecution.optimizedPlan.toString.contains("DivisionJoin"))
    val rows = j.select("d", "a", "x").orderBy("a").collect()
    val want = l.toDF.join(r.toDF, Seq("d"), "inner")
      .select("d", "a", "x").orderBy("a").collect()
    assert(rows.toSeq == want.toSeq)

    // Outer variants through the same pruned shape.
    Seq("left", "full").foreach { how =>
      val got = l.join(r, how).toDF.select("d", "a", "x")
        .orderBy(col("a").asc_nulls_first, col("x").asc_nulls_first).collect()
      val oracle = l.toDF.join(r.toDF, Seq("d"), how).select("d", "a", "x")
        .orderBy(col("a").asc_nulls_first, col("x").asc_nulls_first).collect()
      assert(got.toSeq == oracle.toSeq, s"how=$how")
    }
    } finally PDataset.divisionJoinMinOverride = None
  }

  test("division join normalizes -0.0 and NaN double keys like Catalyst") {
    import spark.implicits._
    val l = Seq((0.0d, "pos"), (Double.NaN, "nan")).toDF("k", "lv")
    val r = Seq((-0.0d, 1L), (Double.NaN, 2L)).toDF("k", "rv")
    val j = graft.plans.DivisionJoin
      .frame(spark, Vector(l), Vector(r), Seq("k"), "inner").get
      .orderBy("rv").collect()
    // Catalyst semantics: -0.0 == 0.0 and NaN == NaN in join keys.
    assert(j.length == 2)
    assert(j(0).getString(1) == "pos" && j(0).getLong(2) == 1L)
    assert(j(1).getString(1) == "nan" && j(1).getLong(2) == 2L)
  }
}
