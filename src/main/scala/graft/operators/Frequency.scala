package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import scala.collection.mutable

/** Exact heavy hitters over unbounded key domains in two bounded
  * passes — "which domains / templates / near-duplicate clusters
  * dominate the corpus" without a full groupBy of a 100 TB column.
  *
  * Pass 1 is a Misra-Gries sketch: each task keeps at most `capacity`
  * counters over the keys it sees, partial summaries merge pairwise
  * (tree reduction — no single-point merge bottleneck, intermediate
  * size stays ≤ capacity), and the classic bound guarantees every key
  * with true count > n/capacity survives to the merged summary. Pass
  * 2 recounts ONLY the ≤ capacity surviving candidates exactly (one
  * broadcast-join + partial aggregate). For any `minCount > n /
  * capacity` the result is therefore EXACT — same rows as `GROUP BY
  * key HAVING count >= minCount` — while the whole-domain groupBy it
  * replaces would shuffle every distinct key.
  *
  * The n/capacity precondition is checked from pass 1's own row
  * count and rejected loudly: a silent approximation would read as
  * exact when it isn't.
  */
object Frequency {

  /** Keys of `keyCol` occurring at least `minCount` times, with their
    * exact counts, `minCount` must exceed n/capacity (checked).
    * Output columns: `<keyCol>`, `n` — descending by count. */
  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      minCount: Long,
      capacity: Int = 4096): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    val (cands, total) = mgCandidates(df, keyCol, capacity)
    if (total == 0L)
      return df.limit(0).groupBy(keyCol).agg(count(lit(1)).as("n"))
    require(minCount.toDouble > total.toDouble / capacity,
      s"minCount=$minCount is within the sketch error bound " +
        s"(n/capacity = $total/$capacity = ${total / capacity}); " +
        s"raise minCount or capacity for an exact answer")
    val keyType = df.schema(keyCol).dataType
    val candDF = spark.createDataFrame(
      java.util.Arrays.asList(cands.map(Row(_)): _*),
      StructType(Seq(StructField(keyCol, keyType, nullable = true))))
    df.join(broadcast(candDF), Seq(keyCol), "left_semi")
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Pass 1: merged Misra-Gries candidate keys and the exact total
    * (non-null) row count. Candidates are a superset of every key
    * with count > total/capacity. */
  private def mgCandidates(
      df: DataFrame, keyCol: String, capacity: Int): (Seq[Any], Long) = {
    val partials = df.select(col(keyCol)).na.drop(Seq(keyCol)).rdd
      .mapPartitions { it =>
        val m = mutable.HashMap.empty[Any, Long]
        var n = 0L
        while (it.hasNext) {
          val v = it.next().get(0)
          n += 1
          m.get(v) match {
            case Some(c) => m.update(v, c + 1)
            case None =>
              if (m.size < capacity) m.update(v, 1L)
              else {
                // decrement-all step: every counter drops by one,
                // zeros evicted (amortized O(1) per row)
                val dead = mutable.ArrayBuffer.empty[Any]
                m.foreach { case (k, c) =>
                  if (c == 1L) dead += k else m.update(k, c - 1)
                }
                dead.foreach(m.remove)
              }
          }
        }
        Iterator.single((m, n))
      }
    // treeAggregate (not treeReduce): the zero value makes an empty
    // or zero-partition input a legal empty summary, not a crash.
    val (merged, total) = partials.treeAggregate(
      (mutable.HashMap.empty[Any, Long], 0L))(
      { case ((a, na), (b, nb)) => (mgMerge(a, b, capacity), na + nb) },
      { case ((a, na), (b, nb)) => (mgMerge(a, b, capacity), na + nb) })
    (merged.keys.toSeq, total)
  }

  /** Merge two MG summaries at the same capacity: sum counts, then
    * shrink back by subtracting the (capacity+1)-th largest count
    * from every counter (the standard mergeable-summary step; the
    * combined error stays ≤ n/capacity). */
  private def mgMerge(
      a: mutable.HashMap[Any, Long],
      b: mutable.HashMap[Any, Long],
      capacity: Int): mutable.HashMap[Any, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[Any]
      a.foreach { case (k, c) =>
        if (c - cut <= 0L) dead += k else a.update(k, c - cut)
      }
      dead.foreach(a.remove)
    }
    a
  }
}
