package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PDataset
import Fixtures._

/** M3: shape operators — fromDataFrame, concat, rename, map, collate
  * (ports of tests/test_from_polars.py, test_concat.py, test_rename.py,
  * test_map.py, test_collate.py). */
class ShapeOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val dir: String = {
    val d = tempDir("graft-shape")
    writeDatetimeSample(spark, d)
    d
  }
  def indexed: PDataset =
    PDataset.scanParquet(spark, dir).reindex(datetimeIndexColumns)

  test("fromDataFrame wraps a frame as a 1-partition dataset with stats") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(datetimeRows: _*), datetimeSchema)
    val ds = PDataset.fromDataFrame(df, Seq("date", "hour"))
    assert(ds.npartitions == 1)
    assert(ds.sizes.get == Vector(98L))
    assert(ds.lowerBounds.get.head == Vector(None, Some(hrs(0))))
    assert(ds.upperBounds.get.head == b(dt("2022-01-04"), hrs(23)))
    assert(ds.knownSchema)
  }

  test("concat concatenates partition lists and metadata") {
    val ds = indexed
    val cc = PDataset.concat(Seq(ds, ds))
    assert(cc.npartitions == 8)
    assert(cc.sizes.get == (datetimeSizes ++ datetimeSizes))
    assert(cc.lowerBounds.get == (datetimeLowerBounds ++ datetimeLowerBounds))
    assert(cc.toDF.count() == 196)
  }

  test("reindex after concat of same-named files keys stats by full path") {
    // Two persisted datasets share part-file basenames; the file-grouped
    // stats job must not merge rows from dirA/part0 and dirB/part0.
    val dirA = tempDir("graft-concat-a"); writeDatetimeSample(spark, dirA)
    val dirB = tempDir("graft-concat-b"); writeDatetimeSample(spark, dirB)
    val cc = PDataset.concat(Seq(
      PDataset.scanParquet(spark, dirA),
      PDataset.scanParquet(spark, dirB)))
    val ds = cc.reindex(datetimeIndexColumns)
    assert(ds.sizes.get == (datetimeSizes ++ datetimeSizes))
    assert(ds.sizes.get.sum == 196L)
    checkBoundsAndSizes(ds)
  }

  test("concat of an empty list yields the 0-partition dataset") {
    // reference: padawan.concat([]) (concatenated_dataset.py:21-33,
    // tests/test_concat.py:27-39); it is transparent in later concats.
    val empty = PDataset.concat(spark, Seq.empty)
    assert(empty.npartitions == 0)
    assert(empty.indexColumns.isEmpty)
    assert(empty.sizes.get.isEmpty)
    val ds = indexed
    val cc = PDataset.concat(Seq(ds, empty))
    assert(cc.npartitions == ds.npartitions)
    assert(cc.sizes.get == ds.sizes.get)
    assert(cc.lowerBounds.get == ds.lowerBounds.get)
    assert(cc.toDF.count() == 98)
  }

  test("concat of only-empty datasets keeps the head's schema and index") {
    val ds = indexed
    val none = ds.slice(b(dt("2030-01-01")), null) // prunes every partition
    assert(none.npartitions == 0)
    val cc = PDataset.concat(Seq(none, none))
    assert(cc.npartitions == 0)
    assert(cc.indexColumns == ds.indexColumns)
    assert(cc.schemaOption.get == ds.schemaOption.get)
    assert(cc.toDF.columns.toSeq == ds.toDF.columns.toSeq)
    assert(cc.toDF.count() == 0)
  }

  test("concat of sliced and full datasets keeps every row of the full side") {
    // The sliced side carries a residual boundary filter; the single-
    // relation toDF fast path must NOT apply it to the full side's
    // partitions (global safety check against partition bounds).
    val ds = indexed
    val sliced = ds.slice(Vector(Some(dt("2022-01-02")), Some(hrs(12))), null)
    val slicedCount = sliced.toDF.count()
    assert(slicedCount > 0 && slicedCount < 98)
    val cc = PDataset.concat(Seq(sliced, ds))
    assert(cc.toDF.count() == slicedCount + 98,
      s"expected ${slicedCount + 98} rows, got ${cc.toDF.count()}")
  }

  test("concat rejects mismatched index columns") {
    intercept[IllegalArgumentException](
      PDataset.concat(Seq(indexed, indexed.reindex(Seq("date", "hour")))))
  }

  test("rename maps columns, index and schema; stats carried through") {
    val ds = indexed.rename(Map("date" -> "date_2", "hour" -> "hour_2", "a" -> "a_2"))
    assert(ds.indexColumns == Seq("date_2", "hour_2", "t"))
    assert(ds.sizes.get == datetimeSizes)
    assert(ds.lowerBounds.get == datetimeLowerBounds)
    assert(ds.schemaOption.get.fieldNames.toSeq == Seq("t", "date_2", "hour_2", "a_2"))
    assert(ds.toDF.columns.toSeq == Seq("t", "date_2", "hour_2", "a_2"))
    checkBoundsAndSizes(ds)
  }

  test("map transforms each partition; preserves contract respected") {
    val ds = indexed.mapPartitionsP(
      df => df.withColumn("a", col("a") * 2),
      preserves = "all")
    assert(ds.sizes.get == datetimeSizes)
    assert(ds.lowerBounds.get == datetimeLowerBounds)
    val total = ds.toDF.agg(sum("a")).collect()(0).getLong(0)
    assert(total == 2L * ((0 until 96).map(_.toLong).sum - 3))
  }

  test("map with new index columns and none preserved drops stats") {
    val ds = indexed.mapPartitionsP(
      df => df.select(col("a").as("z")),
      indexColumns = Seq("z"))
    assert(ds.indexColumns == Seq("z"))
    assert(!ds.knownBounds && !ds.knownSizes)
    val re = ds.reindex()
    assert(re.sizes.get == datetimeSizes)
  }

  test("mapIndexed receives the partition index") {
    val ds = indexed.mapIndexed((df, i) => df.withColumn("pid", lit(i)))
    val pids = ds.toDF.select("pid").distinct().collect().map(_.getInt(0)).sorted
    assert(pids.toSeq == Seq(0, 1, 2, 3))
  }

  test("collate merges adjacent partitions to a minimum size") {
    val ds = indexed.collate(48)
    assert(ds.npartitions == 2)
    assert(ds.sizes.get == Vector(50L, 48L))
    assert(ds.lowerBounds.get == Vector(
      datetimeLowerBounds(0), datetimeLowerBounds(2)))
    assert(ds.upperBounds.get == Vector(
      datetimeUpperBounds(1), datetimeUpperBounds(3)))
    checkBoundsAndSizes(ds)
    assertSameRows(ds.toDF, indexed.toDF)
  }

  test("collate with huge target gives a single partition") {
    val ds = indexed.collate(1000000)
    assert(ds.npartitions == 1)
    assert(ds.sizes.get == Vector(98L))
  }
}
