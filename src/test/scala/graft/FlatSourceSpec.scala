package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PDataset
import Fixtures._

/** CSV/JSON sources ride the same partition-metadata machinery:
  * per-file partitions, single-job stats, pruned slicing. */
class FlatSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  lazy val csvDir: String = {
    val d = tempDir("graft-csv")
    val li = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("o_orderdate", date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
    (0 until 4).foreach { i =>
      stageSingleFile(li.filter(pmod(col("o_orderkey"), lit(4)) === i),
        d, s"part$i.csv", "csv")
    }
    d
  }

  test("scanCsv: per-file partitions, reindex, slice, roundtrip") {
    val ds = PDataset.scanCsv(spark, csvDir)
    assert(ds.npartitions == 4)
    val indexed = ds.reindex(Seq("o_orderkey"))
    assert(indexed.sizes.get.sum == 1500)
    val firstKeys = indexed.lowerBounds.get.map(_.head.get)
    assert(firstKeys.length == 4)
    // slice on the key prunes/filters correctly vs a plain filter
    val hi = 700
    val sliced = indexed.slice(null, Vector(Some(hi)), inclusive = "upper")
    val want = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(csvDir).filter(col("o_orderkey") <= hi)
    assert(sliced.toDF.count() == want.count())
  }

  test("scanOrc: typed columnar source, pruned slicing, exact roundtrip") {
    val d = tempDir("graft-orc")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    (0 until 4).foreach { i =>
      stageSingleFile(orders.filter(pmod(col("o_orderkey"), lit(4)) === i),
        d, s"part$i.orc", "orc")
    }
    val ds = PDataset.scanOrc(spark, d)
    assert(ds.npartitions == 4)
    val indexed = ds.reindex(Seq("o_orderkey"))
    assert(indexed.sizes.get.sum == 1500)
    checkBoundsAndSizes(indexed)
    val sliced = indexed.slice(Vector(Some(200L)), Vector(Some(900L)))
    assertSameRows(sliced.toDF,
      orders.filter(col("o_orderkey") >= 200 && col("o_orderkey") < 900))
    // ORC keeps types (unlike CSV): the timestamp column survives
    assert(indexed.schemaOption.get("o_orderdate").dataType ==
      orders.schema("o_orderdate").dataType)
  }

  test("scanJson: same machinery over json-lines") {
    val d = tempDir("graft-json")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    (0 until 2).foreach { i =>
      stageSingleFile(nation.filter(pmod(col("n_nationkey"), lit(2)) === i),
        d, s"part$i.json", "json")
    }
    val ds = PDataset.scanJson(spark, d).reindex(Seq("n_nationkey"))
    assert(ds.npartitions == 2)
    assert(ds.sizes.get.sum == 25)
    assert(ds.toDF.count() == 25)
  }
}
