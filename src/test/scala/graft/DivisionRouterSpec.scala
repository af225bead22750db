package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{GraftBridge, Row}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{DivisionRouter, DivisionRouterExpr, Lex, PDataset}
import graft.core.Lex.Bound
import Fixtures._

/** The O(log d) binary-search division router must be row-for-row
  * identical to the `when`-chain it replaced — including the
  * three-valued-logic corners (null row values, None bound components)
  * — and stay fast and small-planned at 10^4 divisions.
  */
class DivisionRouterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("differential vs when-chain: temporal index with nulls") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(datetimeRows: _*), datetimeSchema)
    val idx = datetimeIndexColumns.map(col)
    // Bounds drawn from real partition edges plus crafted None-bearing
    // tuples; sorted under the driver's lex order.
    val raw: IndexedSeq[Bound] = IndexedSeq(
      Vector(None, None, None),
      Vector(None, Some(hrs(0)), None),
      Vector(Some(dt("2022-01-01")), None, Some(ts("2022-01-01T05:00:00"))),
      b(dt("2022-01-01"), hrs(12), ts("2022-01-01T12:00:00")),
      b(dt("2022-01-02"), hrs(0), ts("2022-01-02T00:00:00")),
      Vector(Some(dt("2022-01-03")), Some(hrs(7)), None),
      b(dt("2022-01-03"), hrs(7), ts("2022-01-03T07:00:00")),
      b(dt("2022-01-04"), hrs(23), ts("2022-01-04T23:00:00")))
    val divisions = raw.sorted(Lex.boundOrdering)
    assert(PDataset.divisionsSorted(divisions))
    val got = df.select(
      col("a"),
      PDataset.partitionIndexExpr(idx, divisions).as("fast"),
      PDataset.partitionIndexWhenChain(idx, divisions).as("slow"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"row a=${r.get(0)}: " +
        s"router=${r.getInt(1)} when-chain=${r.getInt(2)}")
    }
  }

  test("differential vs when-chain: null rows against None bounds") {
    val df = Seq[java.lang.Long](null, 0L, 1L, 3L, 5L, 7L, 100L).toDF("k")
    val divisions: IndexedSeq[Bound] =
      IndexedSeq(Vector(None), Vector(Some(3L)), Vector(Some(7L)))
    val got = df.select(
      PDataset.partitionIndexExpr(Seq(col("k")), divisions).as("fast"),
      PDataset.partitionIndexWhenChain(Seq(col("k")), divisions).as("slow"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // The quirk itself, pinned: a null row value is NOT less than a None
    // bound (dead false) but IS less than the first valued bound.
    assert(got.head.getInt(0) == 1)
  }

  test("10^4 divisions: correct assignment in bounded time") {
    val d = 10000
    val divisions: IndexedSeq[Bound] =
      (1 to d).map(i => Vector(Some(6L * i): Option[Any])).toVector
    val df = spark.range(0, 60010).select(col("id").as("k"))
    val t0 = System.nanoTime()
    val rows = df.select(col("k"),
      PDataset.partitionIndexExpr(Seq(col("k")), divisions).as("p"))
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    rows.foreach { r =>
      val k = r.getLong(0)
      val want = math.min(k / 6, d.toLong).toInt
      assert(r.getInt(1) == want, s"k=$k: got ${r.getInt(1)}, want $want")
    }
    // The when-chain at this d would OOM codegen; the router is O(log d).
    assert(secs < 60.0, s"routing 60k rows over $d divisions took $secs s")
  }

  test("generated code compiles for long and string children") {
    val longE = DivisionRouterExpr(
      Seq(Literal(7L)),
      Seq(Vector(Some(3L)), Vector(Some(9L))))
    assert(GraftBridge.compileAndEval(longE) == 1)
    val strE = DivisionRouterExpr(
      Seq(Literal("m")),
      Seq(Vector(Some("c")), Vector(Some("x"))))
    assert(GraftBridge.compileAndEval(strE) == 1)
    val nullE = DivisionRouterExpr(
      Seq(Literal(null, LongType)),
      Seq(Vector(None), Vector(Some(5L))))
    assert(GraftBridge.compileAndEval(nullE) == 1)
  }

  test("divisionsSorted gates the binary-search path") {
    assert(PDataset.divisionsSorted(IndexedSeq(b(1L), b(1L), b(2L))))
    assert(!PDataset.divisionsSorted(IndexedSeq(b(2L), b(1L))))
    // Unsorted divisions still route through the when-chain unchanged.
    val df = Seq(0L, 1L, 2L, 3L).toDF("k")
    val unsorted: IndexedSeq[Bound] = IndexedSeq(b(3L), b(1L))
    val got = df.select(
      PDataset.partitionIndexExpr(Seq(col("k")), unsorted).as("p")).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(0, 0, 0, 2))
  }

  test("fast write round-trips through the router (division mode)") {
    val dir = tempDir("router-write")
    val src = tempDir("router-src")
    writeDatetimeSample(spark, src)
    val ds = PDataset.scanParquet(spark, src).reindex(datetimeIndexColumns)
    val re = ds.repartition(30)
    val out = re.writeParquet(dir + "/out")
    checkBoundsAndSizes(out)
    assertSameRows(out.toDF, ds.toDF)
  }
}
