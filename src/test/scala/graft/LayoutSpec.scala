package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import Fixtures.scannedFiles

/** Z-order clustering: interleave correctness, write/read roundtrip,
  * and plan-time file pruning on BOTH clustered columns. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleave spreads bits of each column to its stride") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
    val got = df.select(
      Layout.interleave(Seq(col("a"), col("b")), bits = 4).as("z"))
      .collect().map(_.getLong(0))
    def ref(a: Long, b: Long): Long =
      (0 until 4).map { j =>
        (((a >> j) & 1L) << (2 * j)) | (((b >> j) & 1L) << (2 * j + 1))
      }.reduce(_ | _)
    val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .map { case (a, b) => ref(a, b) }
    assert(got.toSeq == want)
  }

  test("bucketOf is monotone and spans the bucket range") {
    val cuts = Array(10.0, 20.0, 30.0)
    val df = Seq(5L, 10L, 15L, 25L, 99L).toDF("v")
    val got = df.select(Layout.bucketOf(col("v"), cuts).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 1, 1, 2, 3))
  }

  val dir: String = java.nio.file.Files
    .createTempDirectory("graft-layout-spec").resolve("z").toString

  lazy val written: Unit = {
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    // cluster on the two HIGH-cardinality columns: l_suppkey has only
    // 10 distinct values at sf0.001, so its quantile cuts are
    // degenerate and bucket mass shifts with approxQuantile merge
    // order — pruning assertions on it flake under full-suite load
    Layout.zorderWrite(li, dir, Seq("l_orderkey", "l_partkey"),
      targetFiles = 8, bits = 6)
  }

  test("zorder roundtrip preserves the dataset exactly") {
    written
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val back = Layout.zorderRead(spark, dir)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("range predicates on EITHER clustered column prune files") {
    written
    val all = scannedFiles(Layout.zorderRead(spark, dir))
    assert(all >= 4, s"want >=4 files for a meaningful pruning test, got $all")
    // A tight two-sided box must scan strictly fewer files than the
    // full table — on BOTH columns, which a lex layout cannot do.
    val byA = scannedFiles(Layout.zorderRead(spark, dir)
      .filter(col("l_orderkey") <= 100))
    val byB = scannedFiles(Layout.zorderRead(spark, dir)
      .filter(col("l_partkey") <= 10))
    assert(byA < all, s"l_orderkey range did not prune: $byA of $all")
    assert(byB < all, s"l_partkey range did not prune: $byB of $all")
    // and the results stay correct vs the unpruned scan
    val want = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_partkey") <= 10).count()
    val got = Layout.zorderRead(spark, dir)
      .filter(col("l_partkey") <= 10).count()
    assert(got == want)
  }


  test("zorderAppend lands increments in the existing bucket space") {
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val batch1 = li.filter(col("l_orderkey") % 2 === 0)
    val batch2 = li.filter(col("l_orderkey") % 2 =!= 0)
    val d = java.nio.file.Files
      .createTempDirectory("graft-layout-append").resolve("z").toString
    Layout.zorderWrite(batch1, d, Seq("l_orderkey", "l_partkey"),
      targetFiles = 8, bits = 6)
    Layout.zorderAppend(batch2, d, targetFiles = 4)
    // roundtrip exact across old + new files
    val back = Layout.zorderRead(spark, d)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
    // pruning still effective across BOTH generations and BOTH columns
    val all = scannedFiles(back)
    assert(all >= 10, s"append should add files, got $all")
    val byA = scannedFiles(Layout.zorderRead(spark, d)
      .filter(col("l_orderkey") <= 100))
    val byB = scannedFiles(Layout.zorderRead(spark, d)
      .filter(col("l_partkey") <= 10))
    assert(byA < all, s"l_orderkey range did not prune: $byA of $all")
    assert(byB < all, s"l_partkey range did not prune: $byB of $all")
    val want = li.filter(col("l_partkey") <= 10).count()
    assert(Layout.zorderRead(spark, d)
      .filter(col("l_partkey") <= 10).count() == want)
  }

  test("zorderRead takes the schema from the sidecar, not a footer") {
    // Replace the glob-first data file with a schema-NARROWER parquet
    // (only column `a`): a footer-inferred schema would silently
    // define the relation as 1-column; the sidecar schema must win,
    // with the narrow file's missing column read as null.
    val df = (1L to 80L).map(i => (i, i * 10)).toDF("a", "b")
    val d = java.nio.file.Files
      .createTempDirectory("graft-layout-schema").resolve("z").toString
    Layout.zorderWrite(df, d, Seq("a", "b"), targetFiles = 4, bits = 3)
    val dirPath = new java.io.File(d)
    val first = dirPath.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")
        && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).sorted.head
    val tmpD = java.nio.file.Files
      .createTempDirectory("graft-layout-schema-narrow").toString
    Seq(-1L).toDF("a").coalesce(1).write.mode("overwrite").parquet(tmpD)
    val part = new java.io.File(tmpD).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(dirPath, first).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the local-FS checksum shadow of the replaced file
    new java.io.File(dirPath, s".$first.crc").delete()
    val back = Layout.zorderRead(spark, d)
    assert(back.schema.fieldNames.toSeq == Seq("a", "b"))
    // No filter: the replaced file's sidecar stats are deliberately
    // stale, so a pushed predicate would prune it — the point here is
    // only that the RELATION schema comes from the sidecar and the
    // narrow file's missing column reads as null.
    val rows = back.collect()
    assert(rows.exists(r => r.getLong(0) == -1L && r.isNullAt(1)))
  }

  test("stats survive null values soundly") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 1L), (2L, null), (3L, 3L), (4L, 4L), (5L, 5L), (6L, 6L),
      (7L, 7L), (8L, 8L))
      .toDF("a", "b")
    val d2 = java.nio.file.Files
      .createTempDirectory("graft-layout-null").resolve("z").toString
    Layout.zorderWrite(df, d2, Seq("a", "b"), targetFiles = 4, bits = 3)
    val back = Layout.zorderRead(spark, d2)
    assert(back.filter(col("b").isNull).count() == 1)
    assert(back.filter(col("b") === 3L).count() == 1)
    assert(back.count() == 8)
  }
}
