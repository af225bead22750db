package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators: explicit key salting for joins whose key
  * distribution concentrates on a few hot values (the 100 TB failure
  * mode AQE's runtime skew-join mitigates for sort-merge joins, made
  * deterministic and strategy-independent here).
  */
object Skew {

  /** Skew-safe equi-join, row-identical to the plain USING equi-join
    * for all four join types.
    *
    *  - `inner` / `left`: the (big, skewed) left side gets a
    *    deterministic salt in [0, salts) derived from its full row
    *    content, the right side is replicated across all salts, and
    *    the join key becomes (keys, salt) — a hot key's rows spread
    *    over `salts` reducers instead of hammering one. Each left row
    *    still meets every right row of its key exactly once.
    *  - `right`: the mirror image — the preserved (right) side is
    *    salted and drives, the left side replicates.
    *  - `full`: the salted left join UNION ALL the right rows with no
    *    key match (typed nulls for the left columns). The anti probe
    *    runs against the DISTINCT left keys, so a hot key contributes
    *    one row there — no skew amplification on the outer leg.
    *
    * Cost: the replicated side shuffles `salts` copies — use for
    * big-skewed x modest-dimension joins, with `salts` around the
    * executor-core count (`full` adds a distinct over the left keys
    * plus an anti join on them).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int = 16,
      how: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be positive")
    how.toLowerCase.replace("_", "") match {
      case "inner" => saltedCore(left, right, keys, salts, "inner")
      case "left" | "leftouter" => saltedCore(left, right, keys, salts, "left")
      case "right" | "rightouter" =>
        // mirror: salt the preserved side, replicate left; restore
        // the plain right join's column order (keys, left, right)
        val swapped = saltedCore(right, left, keys, salts, "left")
        val leftNonKey = left.columns.filterNot(keys.contains)
        val rightNonKey = right.columns.filterNot(keys.contains)
        swapped.select((keys ++ leftNonKey ++ rightNonKey).map(col): _*)
      case "full" | "outer" | "fullouter" =>
        val matchedOrLeft = saltedCore(left, right, keys, salts, "left")
        val rightOnly = right.join(
          left.select(keys.map(col): _*).distinct(), keys, "left_anti")
        val leftNonKey = left.schema.filterNot(f => keys.contains(f.name))
        val rightNonKey = right.columns.filterNot(keys.contains)
        val rightPart = rightOnly.select(
          keys.map(col) ++
            leftNonKey.map(f => lit(null).cast(f.dataType).as(f.name)) ++
            rightNonKey.map(col): _*)
        matchedOrLeft.unionByName(rightPart)
      case other => throw new IllegalArgumentException(
        s"salted join supports inner/left/right/full, got '$other'")
    }
  }

  private def saltedCore(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int,
      how: String): DataFrame = {
    val reserved = Seq("__salt").filter((left.columns ++ right.columns).contains)
    require(reserved.isEmpty, "column __salt is reserved by saltedJoin")
    val l = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", how).drop("__salt")
  }
}
