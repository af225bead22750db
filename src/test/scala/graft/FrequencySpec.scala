package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Frequency
import Fixtures._

/** Misra-Gries heavy hitters: exact above the error bound even with a
  * tiny sketch over a skewed stream, loud rejection below it. */
class FrequencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact result above the bound with capacity far below the domain") {
    // ~166k rows: key i in 0..9 appears (i+1)*2000 times (heavy),
    // plus 56k distinct singleton keys (long tail).
    val rows = (0L until 10L).flatMap(i => Seq.fill(((i + 1) * 2000).toInt)(i)) ++
      (1000000L until 1056000L)
    val df = rows.toDF("k").repartition(16)
    val n = rows.length.toLong
    val capacity = 512 // far below 56k distinct keys
    val minCount = 2000L
    assert(minCount > n / capacity)
    val got = Frequency.heavyHitters(df, "k", minCount, capacity)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (0L until 10L).map(i => (i, (i + 1) * 2000))
    assert(got.toSeq == want,
      s"expected the 10 heavy keys with exact counts, got ${got.toSeq}")
  }

  test("rejects a minCount inside the sketch error bound") {
    val df = spark.range(100000L).select((col("id") % 50000).as("k"))
    assertThrows[IllegalArgumentException] {
      Frequency.heavyHitters(df, "k", minCount = 2L, capacity = 64)
    }
  }

  test("string keys work and nulls are ignored") {
    val df = (Seq.fill(100)("hot") ++ (0 until 500).map(i => s"cold-$i") ++
      Seq.fill(5)(null.asInstanceOf[String])).toDF("k").repartition(8)
    val got = Frequency.heavyHitters(df, "k", minCount = 50L, capacity = 128)
      .collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "hot" && got.head.getLong(1) == 100L)
  }
}
