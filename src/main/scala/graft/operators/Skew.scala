package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators: explicit key salting for joins whose key
  * distribution concentrates on a few hot values (the 100 TB failure
  * mode AQE's runtime skew-join mitigates for sort-merge joins, made
  * deterministic and strategy-independent here).
  */
object Skew {

  /** Skew-safe equi-join: the (big, skewed) left side gets a
    * deterministic salt in [0, salts) derived from its full row
    * content, the right side is replicated across all salts, and the
    * join key becomes (keys, salt) — a hot key's rows spread over
    * `salts` reducers instead of hammering one. Row-identical to the
    * plain equi-join for "inner" and "left" (each left row still meets
    * every right row of its key exactly once).
    *
    * Cost: the right side shuffles `salts` copies — use for
    * big-skewed x modest-dimension joins, with `salts` around the
    * executor-core count.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int = 16,
      how: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be positive")
    require(Seq("inner", "left").contains(how),
      "salted join supports inner and left (the salted side must drive)")
    val reserved = Seq("__salt").filter((left.columns ++ right.columns).contains)
    require(reserved.isEmpty, "column __salt is reserved by saltedJoin")
    val l = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", how).drop("__salt")
  }
}
