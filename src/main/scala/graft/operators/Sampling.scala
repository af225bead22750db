package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data
  * pipelines.
  *
  * The keep/drop decision is a pure function of the row's id (an
  * md5-derived uniform fraction), so it is reproducible across runs,
  * engines and partitionings — unlike `DataFrame.sample`, whose output
  * depends on partition layout. Each row decides independently in one
  * narrow scan: no shuffle, no per-stratum groupBy, which is the only
  * shape that survives 100 TB (a true exact quota would need a global
  * count/sort per stratum; at corpus scale the hash fraction's
  * concentration makes the realized rate indistinguishable from the
  * target).
  */
object Sampling {

  /** Uniform [0, 1) fraction derived from the first 32 md5 bits of the
    * id's decimal string — md5 (not xxhash64) so the same decision is
    * reproducible in any engine with md5 (reference: the DuckDB
    * oracle rederives it exactly). */
  def hashFraction(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Uniform deterministic sample: keep iff hashFraction(id) < p. */
  def deterministicSample(df: DataFrame, idCol: String, p: Double): DataFrame =
    df.filter(hashFraction(col(idCol)) < lit(p))

  /** Per-group quota cap: keep at most `maxPerGroup` rows per value
    * of `groupCol` (e.g. cap documents per domain so no source
    * dominates the corpus), chosen deterministically by md5 order of
    * the id — reproducible across runs, engines and partitionings,
    * unlike "first N seen". One shuffle on the group key. For
    * `maxPerGroup` at or under
    * `spark.sql.optimizer.windowGroupLimitThreshold` (default 1000)
    * Spark plans a WindowGroupLimit that caps every group at
    * maxPerGroup rows PER MAP TASK before the exchange (PlanSpec
    * pins it), so even a mega-group ships at most maxPerGroup ×
    * tasks rows; above that threshold the optimization doesn't fire
    * and a mega-group sorts in full on one reducer — raise the
    * threshold alongside very large quotas. Groups at or under quota
    * pass through whole. */
  def quotaCap(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      maxPerGroup: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerGroup)
      .drop("__rn")
  }

  /** Stratified deterministic sample: each stratum keeps its own
    * fraction (e.g. per-language quotas when balancing a multilingual
    * corpus); strata not listed keep `defaultFraction`. */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction): Column) {
      case (acc, (stratum, p)) =>
        when(col(stratumCol) === lit(stratum), lit(p)).otherwise(acc)
    }
    df.filter(hashFraction(col(idCol)) < frac)
  }
}
