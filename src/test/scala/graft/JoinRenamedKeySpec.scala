package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.PDataset

/** Regression: the division join must survive optimizer attribute
  * rewriting. RemoveRedundantAliases drops a rename's alias and
  * renames child outputs (post-analysis identity is the exprId, not
  * the name), so the join's key bookkeeping must be attribute-based —
  * a name-based lookup broke exactly this shape: rename -> reindex ->
  * join -> aggregate. */
class JoinRenamedKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join on a renamed key survives alias removal and aggregates") {
    PDataset.divisionJoinMinOverride = Some(2)
    try {
    val d = "/root/testdata/sf0.001"
    val li = PDataset.scanParquet(spark, s"$d/lineitem.parquet")
      .rename(Map("l_orderkey" -> "okey")).reindex(Seq("okey"))
    val o = PDataset.scanParquet(spark, s"$d/orders.parquet")
      .rename(Map("o_orderkey" -> "okey")).reindex(Seq("okey"))
    val joined = li.join(o, "inner").toDF
    assert(joined.queryExecution.optimizedPlan.toString
      .contains("DivisionJoin"))
    val out = joined
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
      .collect()
    val want = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
      .collect()
    assert(out.toSeq == want.toSeq)
    } finally PDataset.divisionJoinMinOverride = None
  }
}
