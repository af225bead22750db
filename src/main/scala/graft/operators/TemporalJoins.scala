package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: as-of (event-to-
  * latest-snapshot) and interval/range joins.
  *
  * Both are composed from built-in operators in their scale-safe
  * shapes — an as-of join is ONE shuffle on the key plus a single
  * window pass (no join node at all), and a range join is an equi-join
  * on (key, time bucket) with a residual interval filter, so the pair
  * space is bounded by bucket co-occupancy instead of |L| x |R|.
  * Both are deterministic and ANSI-SQL rederivable (DuckDB ASOF JOIN /
  * BETWEEN join), so they carry full oracles.
  */
object TemporalJoins {

  /** As-of join: attach to each left row the payload of the closest
    * right row within the same key — the latest with
    * `right.ts <= left.ts` (direction "backward", the default) or the
    * earliest with `right.ts >= left.ts` ("forward"). Rows at equal
    * timestamps match. Left rows with no qualifying right row keep
    * null payload (left-outer semantics, like DuckDB `ASOF LEFT
    * JOIN`).
    *
    * Plan shape: union both sides tagged, one shuffle on `keys`, one
    * window pass forward-filling the right payload as a struct (row
    * integrity preserved — all payload columns come from the SAME
    * right row). No join node, no pair space: cost is a sort within
    * key partitions, which is the floor for this operator.
    *
    * Right rows with null timestamps are dropped. The right side
    * should be unique per (keys, ts) — with duplicates, which row
    * wins is tie-broken by window order and not guaranteed. NULL keys
    * group together (a null-key left row sees null-key right rows),
    * unlike an SQL equi-join where nulls never match — filter null
    * keys first if SQL semantics are needed.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward").contains(direction),
      s"direction must be 'backward' or 'forward', got '$direction'")
    val backward = direction == "backward"
    val payloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == tsCol)
    require(payloadCols.nonEmpty, "right side has no payload columns")
    val dup = left.columns.toSeq.intersect(payloadCols.toSeq)
    require(dup.isEmpty,
      s"payload columns ${dup.mkString(", ")} collide with left columns; " +
        "rename the right side first")
    val reserved = Seq("__src", "__r", "__m")
      .filter((left.columns ++ right.columns).contains)
    require(reserved.isEmpty,
      s"columns ${reserved.mkString(", ")} are reserved by asofJoin")

    val r2 = right
      .filter(col(tsCol).isNotNull)
      .select((keys :+ tsCol).map(col) :+
        struct(payloadCols.map(col): _*).as("__r"): _*)
      .withColumn("__src", lit(0))
    val l2 = left
      .withColumn("__src", lit(1))
      .withColumn("__r", lit(null).cast(r2.schema("__r").dataType))
    val all = l2.unionByName(r2, allowMissingColumns = true)

    // At equal ts the right row must be visible from the left row:
    // backward scans [start, current] so right sorts first; forward
    // scans [current, end] so right sorts after.
    val ord =
      if (backward) Seq(col(tsCol).asc, col("__src").asc)
      else Seq(col(tsCol).asc, col("__src").desc)
    val w0 = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val filled =
      if (backward)
        last(col("__r"), ignoreNulls = true).over(
          w0.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("__r"), ignoreNulls = true).over(
          w0.rowsBetween(Window.currentRow, Window.unboundedFollowing))

    val out = left.columns.map(col).toSeq ++
      payloadCols.map(c => col("__m." + c).as(c))
    all.withColumn("__m", filled)
      .filter(col("__src") === 1)
      .select(out: _*)
  }

  /** Interval (range) join: all (left row, interval) pairs with
    * `start <= left.ts <= end` within the same key, as a bucketized
    * equi-join — intervals explode to the fixed-width time buckets
    * they cover, left rows carry their single bucket, candidates come
    * from an equi-join on (keys, bucket) and the exact interval filter
    * runs on candidates only. An interval covers a row's bucket
    * exactly once, so no pair deduplication is needed.
    *
    * `bucketWidth` (microseconds) trades shuffle fan-out (an interval
    * produces ~length/width bucket rows) against candidate precision;
    * set it near the typical interval length.
    */
  def rangeJoin(
      left: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      keys: Seq[String],
      bucketWidthMicros: Long): DataFrame = {
    require(bucketWidthMicros > 0, "bucketWidthMicros must be positive")
    val dup = left.columns.toSeq
      .intersect(intervals.columns.toSeq.filterNot(keys.contains))
    require(dup.isEmpty,
      s"interval columns ${dup.mkString(", ")} collide with left columns; " +
        "rename first")
    def micros(c: Column) = unix_micros(c.cast("timestamp"))
    val w = lit(bucketWidthMicros)
    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("__bkt",
        explode(sequence(
          floor(micros(col(startCol)) / w),
          floor(micros(col(endCol)) / w))))
    val l2 = left
      .filter(col(tsCol).isNotNull)
      .withColumn("__bkt", floor(micros(col(tsCol)) / w))
    l2.join(iv, keys :+ "__bkt")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bkt")
  }
}
