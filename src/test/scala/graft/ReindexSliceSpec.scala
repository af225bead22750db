package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Lex, PDataset}
import Fixtures._

class ReindexSliceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val dir: String = {
    val d = tempDir("graft-dt-sample")
    writeDatetimeSample(spark, d)
    d
  }

  def scanned: PDataset = PDataset.scanParquet(spark, dir)

  test("scan without sidecar: 8 partitions, unknown stats") {
    val ds = scanned
    assert(ds.npartitions == 8)
    assert(!ds.knownSizes)
    assert(ds.indexColumns.isEmpty)
    assert(ds.toDF.count() == 98)
  }

  test("reindex computes fixture stats and drops empty partitions") {
    val ds = scanned.reindex(datetimeIndexColumns)
    assert(ds.npartitions == 4)
    assert(ds.sizes.get == datetimeSizes)
    ds.lowerBounds.get.zip(datetimeLowerBounds).foreach { case (g, w) =>
      assert(Lex.lexCmp(g, w) == 0, s"$g != $w")
    }
    ds.upperBounds.get.zip(datetimeUpperBounds).foreach { case (g, w) =>
      assert(Lex.lexCmp(g, w) == 0, s"$g != $w")
    }
    assert(ds.schemaOption.get.fieldNames.toSeq == Seq("t", "date", "hour", "a"))
    checkBoundsAndSizes(ds)
  }

  test("reindex prefix fast path is metadata-only") {
    val ds = scanned.reindex(datetimeIndexColumns)
    val pre = ds.reindex(Seq("date", "hour"))
    assert(pre.npartitions == 4)
    assert(pre.sizes.get == datetimeSizes)
    assert(pre.lowerBounds.get == datetimeLowerBounds.map(_.take(2)))
    assert(pre.upperBounds.get == datetimeUpperBounds.map(_.take(2)))
  }

  test("reindex collectStats=false declares columns only") {
    val ds = scanned.reindex(Seq("t"), collectStats = false)
    assert(ds.indexColumns == Seq("t"))
    assert(!ds.knownBounds)
  }

  def dhIndexed: PDataset = scanned.reindex(Seq("date", "hour"))
  def full = spark.read.parquet(
    java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted: _*)

  test("slice: single partition window") {
    val ds = dhIndexed.slice(b(dt("2022-01-02"), hrs(6)), b(dt("2022-01-02"), hrs(18)))
    assert(ds.npartitions == 1)
    assertSameRows(ds.toDF,
      full.filter(col("t") >= lit(ts("2022-01-02T06:00:00")) &&
        col("t") < lit(ts("2022-01-02T18:00:00"))))
  }

  test("slice: two partitions") {
    val ds = dhIndexed.slice(b(dt("2022-01-02"), hrs(6)), b(dt("2022-01-03"), hrs(18)))
    assert(ds.npartitions == 2)
    assertSameRows(ds.toDF,
      full.filter(col("t") >= lit(ts("2022-01-02T06:00:00")) &&
        col("t") < lit(ts("2022-01-03T18:00:00"))))
  }

  test("slice: null bounds = everything") {
    val ds = dhIndexed.slice(null, null)
    assertSameRows(ds.toDF, full)
  }

  test("slice: no upper bound") {
    val ds = dhIndexed.slice(b(dt("2022-01-02"), hrs(6)), null)
    assertSameRows(ds.toDF,
      full.filter(col("t") >= lit(ts("2022-01-02T06:00:00"))))
  }

  test("slice: no lower bound keeps null-index rows") {
    val ds = dhIndexed.slice(null, b(dt("2022-01-03"), hrs(18)))
    assertSameRows(ds.toDF,
      full.filter(col("t").isNull ||
        col("t") < lit(ts("2022-01-03T18:00:00"))))
  }

  test("slice: null components in bounds select the null-date rows") {
    val ds = dhIndexed.slice(b(null, hrs(-10)), b(dt("2022-01-01"), null))
    assert(ds.npartitions == 1)
    assertSameRows(ds.toDF, full.filter(col("date").isNull))
  }

  test("slice: flipped bounds give an empty dataset") {
    val ds = dhIndexed.slice(b(dt("2022-01-01"), null), b(null, hrs(-10)))
    assert(ds.npartitions == 0)
    assert(ds.toDF.count() == 0)
  }

  test("slice: irrelevant bounds preserve sizes and bounds") {
    val ds = dhIndexed.slice(b(null, hrs(-10)), b(dt("2022-01-06"), hrs(10)))
    assert(ds.sizes.get == datetimeSizes)
    assert(ds.lowerBounds.get == datetimeLowerBounds.map(_.take(2)))
    assert(ds.upperBounds.get == datetimeUpperBounds.map(_.take(2)))
  }

  test("slice: inclusive modes select the right partitions and edges") {
    val lb = b(dt("2022-01-02"), hrs(23))
    val ub = b(dt("2022-01-04"), hrs(0))
    def edges(inc: String): (Int, Seq[Lex.Bound]) = {
      val ds = dhIndexed.slice(lb, ub, inclusive = inc)
      val rows = ds.toDF.select(col("date"), col("hour"))
        .orderBy(col("date").asc_nulls_first, col("hour").asc_nulls_first)
        .collect()
      val bs = rows.map(r => Vector(Option(r.get(0)), Option(r.get(1))): Lex.Bound)
      (ds.npartitions, Seq(bs.head, bs.last))
    }
    val (n0, e0) = edges("none")
    assert(n0 == 1 && Lex.lexCmp(e0.head, lb) > 0 && Lex.lexCmp(e0.last, ub) < 0)
    val (n1, e1) = edges("lower")
    assert(n1 == 2 && Lex.lexCmp(e1.head, lb) == 0 && Lex.lexCmp(e1.last, ub) < 0)
    val (n2, e2) = edges("upper")
    assert(n2 == 2 && Lex.lexCmp(e2.head, lb) > 0 && Lex.lexCmp(e2.last, ub) == 0)
    val (n3, e3) = edges("both")
    assert(n3 == 3 && Lex.lexCmp(e3.head, lb) == 0 && Lex.lexCmp(e3.last, ub) == 0)
  }

  test("slice: prefix-column bounds") {
    val ds = dhIndexed.slice(b(dt("2022-01-02")), b(dt("2022-01-04")), inclusive = "both")
    assertSameRows(ds.toDF,
      full.filter(col("date") >= lit(dt("2022-01-02")) &&
        col("date") <= lit(dt("2022-01-04"))))
  }

  test("disjointness check") {
    val ds = dhIndexed
    assert(ds.isDisjoint)
    ds.assertDisjoint()
  }
}
