package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PDataset
import Fixtures._

/** `spark.read.format("graft")`: the registered short name over a
  * sidecar-carrying dataset directory — correct rows, sidecar schema,
  * plan-time file pruning, and plain-SQL access. */
class GraftSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  lazy val dir: String = {
    val out = tempDir("graft-source-spec") + "/li.parquet"
    PDataset.scanParquet(spark, s"$sf/lineitem.parquet")
      .reindex(Seq("l_shipdate"))
      .repartition(800)
      .writeParquet(out)
    out
  }


  test("format(\"graft\") reads the dataset with the sidecar schema") {
    val got = spark.read.format("graft").load(dir)
    val want = PDataset.scanParquet(spark, dir)
    assert(got.schema == want.schemaOption.get)
    assertSameRows(got, want.toDF)
  }

  test("pushed filters on the index column prune planned files") {
    val ds = PDataset.scanParquet(spark, dir)
    val total = ds.npartitions
    assert(total >= 4)
    val lastLb = ds.lowerBounds.get.last.head.get
      .asInstanceOf[java.time.LocalDateTime]
    val pruned = spark.read.format("graft").load(dir)
      .filter(col("l_shipdate") >= lit(lastLb))
    assert(scannedFiles(pruned) == 1,
      s"expected 1 of $total files planned")
    // correctness: equal to the unpruned filter
    val want = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") >= lit(lastLb)).count()
    assert(pruned.count() == want)
  }

  test("plain SQL over a graft view") {
    spark.read.format("graft").load(dir).createOrReplaceTempView("li_graft")
    val n = spark.sql("SELECT count(*) AS n FROM li_graft").collect()(0).getLong(0)
    val want = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(n == want)
  }

  test("sink option(\"bloom\", ...) adds point-lookup file skipping") {
    val out = tempDir("graft-source-bloom") + "/o.parquet"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.write.format("graft")
      .option("index", "o_orderdate").option("files", "8")
      .option("bloom", "o_orderkey")
      .save(out)
    assert(graft.core.BloomIndex.exists(spark, out))
    val q = spark.read.format("graft").load(out)
      .filter(col("o_orderkey") === 700L) // non-index point lookup
    assert(q.count() == 1)
    assert(scannedFiles(q) <= 2, "bloom built by the sink must prune")
  }

  test("write.format(\"graft\") produces a pruning-capable dataset") {
    val out = tempDir("graft-source-write") + "/o.parquet"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.write.format("graft")
      .option("index", "o_orderdate").option("files", "6")
      .save(out)
    // reopens through BOTH surfaces with identical rows
    val viaSource = spark.read.format("graft").load(out)
    val viaEngine = PDataset.scanParquet(spark, out)
    assert(viaEngine.npartitions == 6)
    assert(viaEngine.indexColumns == Seq("o_orderdate"))
    assertSameRows(viaSource, orders)
    // range clustering makes the index column prune
    val lastLb = viaEngine.lowerBounds.get.last.head.get
      .asInstanceOf[java.time.LocalDateTime]
    val pruned = viaSource.filter(col("o_orderdate") >= lit(lastLb))
    assert(scannedFiles(pruned) < 6)
    // append keeps the sidecar consistent (all rows, both generations)
    val extra = orders.limit(100)
    extra.write.format("graft").mode("append")
      .option("index", "o_orderdate").option("files", "2").save(out)
    val appended = spark.read.format("graft").load(out)
    assert(appended.count() == orders.count() + 100)
  }

  test("graft sink demands the index option") {
    val out = tempDir("graft-source-noindex") + "/x.parquet"
    val e = intercept[IllegalArgumentException] {
      spark.range(5).toDF("v").write.format("graft").save(out)
    }
    assert(e.getMessage.contains("index"))
  }

  test("a directory without a sidecar is rejected with guidance") {
    val plain = tempDir("graft-source-plain")
    spark.range(10).write.mode("overwrite").parquet(plain)
    val e = intercept[Exception] {
      spark.read.format("graft").load(plain).collect()
    }
    assert(e.getMessage != null)
  }
}
