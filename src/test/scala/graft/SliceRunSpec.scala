package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PDataset
import Fixtures._

/** Edge cases of contiguous-SlicePart run detection — the machinery
  * that lets unwritten repartitioned datasets plan one scan. The
  * danger cases are silent WRONG-DATA shapes (a concat of two full
  * repartitions must NOT collapse to one copy of the source), so each
  * is locked with a row-level differential. */
class SliceRunSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val dir: String = {
    val d = tempDir("graft-slicerun")
    writeDatetimeSample(spark, d)
    d
  }
  def indexed: PDataset =
    PDataset.scanParquet(spark, dir).reindex(datetimeIndexColumns)

  private def scanCount(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def go(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case _: FileSourceScanExec => 1
      case other => other.children.map(go).sum
    }
    go(df.queryExecution.executedPlan)
  }

  test("concat of two full repartitions preserves duplication (no false merge)") {
    // both inputs cover (None, None): their junction is None == None,
    // which run detection must REJECT — a false merge would plan one
    // copy of the source and silently halve the data
    val cat = PDataset.concat(Seq(indexed.repartition(30), indexed.repartition(30)))
    assert(cat.toDF.count() == 196)
    assertSameRows(cat.toDF, indexed.toDF.union(indexed.toDF))
  }

  test("concat of adjacent slices of one repartition merges back to one scan") {
    val rp = indexed.repartition(30)
    assert(rp.npartitions >= 3)
    val mid = rp.lowerBounds.get(2)
    val lo = rp.slice(null, mid)
    val hi = rp.slice(mid, null)
    val cat = PDataset.concat(Seq(lo, hi))
    // [None, mid) ++ [mid, None) chains exactly -> one slice of the
    // source, planned as a single relation
    assert(scanCount(cat.toDF) == 1,
      cat.toDF.queryExecution.executedPlan.toString)
    assertSameRows(cat.toDF, indexed.toDF)
  }

  test("repartition of a repartition still plans one source scan") {
    val rp2 = indexed.repartition(40).repartition(20)
    assert(scanCount(rp2.toDF) == 1,
      rp2.toDF.queryExecution.executedPlan.toString)
    assertSameRows(rp2.toDF, indexed.toDF)
    checkBoundsAndSizes(rp2)
  }

  test("slice of a collated repartition tightens the merged run") {
    val coll = indexed.repartition(8).collate(30)
    assert(coll.npartitions >= 2)
    val mid = coll.lowerBounds.get(1)
    val sliced = coll.slice(mid, null)
    assert(scanCount(sliced.toDF) == 1,
      sliced.toDF.queryExecution.executedPlan.toString)
    val want = indexed.toDF.filter(
      graft.core.LexColumns.columnsGeq(
        datetimeIndexColumns.map(col), mid))
    assertSameRows(sliced.toDF, want)
  }
}
