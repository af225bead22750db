package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the `ANALYZE TABLE` a data engineer
  * runs before trusting a new corpus: per column, row count, null
  * count, distinct count and min/max, computed for EVERY column in a
  * single scan (one aggregate row, exploded to one output row per
  * column on the driver side of the plan).
  *
  * `exact = false` (the at-scale default) uses HLL distinct counts —
  * mergeable, no shuffle beyond the one partial-agg exchange.
  * `exact = true` swaps in exact distinct counts (one expand +
  * shuffle, the price of exactness) for oracle-grade comparisons at
  * test scale. min/max render as strings so one tidy frame covers
  * heterogeneous column types.
  */
object Profile {

  def describe(df: DataFrame, exact: Boolean = false): DataFrame = {
    val cols = df.columns.toSeq
    // columns resolved via df(...) and aliased by ORDINAL: names with
    // dots/backticks profile like any other
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(df(c)).as(s"__cnt_$i"),
        (if (exact) count_distinct(df(c))
         else approx_count_distinct(df(c))).as(s"__ndv_$i"),
        min(df(c)).cast("string").as(s"__min_$i"),
        max(df(c)).cast("string").as(s"__max_$i"))
    }
    val total = count(lit(1)).as("__total")
    val row = df.agg(total, aggs: _*)
    // one row in -> |cols| rows out: a tiny driver-side reshape of
    // the single aggregate row, not a per-column job
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__cnt_$i")).as("n_nulls"),
        col(s"__ndv_$i").as("n_distinct"),
        col(s"__min_$i").as("min_value"),
        col(s"__max_$i").as("max_value"))
    }
    row.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
