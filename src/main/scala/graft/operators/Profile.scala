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
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val total = count(lit(1)).as("__total")
    val row = df.agg(total, aggs: _*)
    // one row in -> |cols| rows out: a tiny driver-side reshape of
    // the single aggregate row, not a per-column job
    val stacked = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__ndv_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    row.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
