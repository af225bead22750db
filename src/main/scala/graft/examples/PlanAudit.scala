package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Print the formatted physical plan of named [[SparkEntry]] queries:
  * `runMain graft.examples.PlanAudit <sfDir> <query> [query...]`.
  * For auditing plan shape (scan counts, Exchanges, pushed filters,
  * codegen spans) against the 100 TB design goals — grep the output
  * for `Exchange` / `PushedFilters` / `WholeStageCodegen`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanAudit <sfDir> <query> [query...]")
    val spark = SparkSession.builder()
      .appName("graft-plan-audit")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      args.drop(1).foreach { name =>
        val df = SparkEntry.queries(name)(spark, args(0))
        println(s"==== $name ====")
        println(df.queryExecution.explainString(
          ExplainMode.fromString("formatted")))
      }
    } finally spark.stop()
  }
}
