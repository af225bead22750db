package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, Filter, PrunedFilteredScan}
import org.apache.spark.sql.types.StructType

/** The DV-pending read path of `spark.read.format("graft")` — a table
  * with deletion vectors outstanding is served merge-on-read (base
  * rows anti-joined against the broadcast vectors; readers never see
  * deleted rows), and that anti join must not cost the reader the
  * vectorized parquet scan:
  *
  *   - Sessions built with [[graft.GraftExtensions]] (the documented
  *     entry point) never execute this relation at all:
  *     [[DvScanSubstitution]] replaces its `LogicalRelation` during
  *     analysis with the native merge-on-read plan from
  *     [[graft.operators.DeletionVectors.scan]], so the OUTER query
  *     optimizes through it — filters push past the anti join into
  *     the columnar parquet scan, `GraftFileIndex` file pruning
  *     fires, and the physical plan is the broadcast anti join over
  *     the vectorized scan (no RDD boundary anywhere).
  *   - Sessions without the extensions fall back to the V1
  *     `PrunedFilteredScan` below — but with `needConversion = false`
  *     and the scan returning the inner plan's `toRdd`, so rows cross
  *     the V1 boundary as InternalRows. The pre-round-12 path
  *     round-tripped every row InternalRow -> Row -> InternalRow
  *     (measured by `graft.examples.DvReadOverhead`); this keeps the
  *     inner merge-on-read plan fully columnar/codegen and the only
  *     cost is the opaque RDD boundary in the outer plan (no file
  *     pruning from OUTER-query filters — the translated prefilter
  *     below restores it inside the inner plan).
  */
final class DvPendingRelation(
    spark: SparkSession,
    val path: String,
    tableSchema: StructType,
    sqlc: SQLContext) extends BaseRelation with PrunedFilteredScan {

  /** The analyzed merge-on-read plan, built eagerly at `load()` time
    * (outside any analyzer run) so [[DvScanSubstitution]] can splice
    * it without re-entrant analysis. The DV overlay is snapshotted
    * here — the same point in time a V1 scan would bind it. */
  val nativePlan: LogicalPlan = org.apache.spark.sql.GraftBridge
    .planOf(graft.operators.DeletionVectors.scan(spark, path))

  override val sqlContext: SQLContext = sqlc
  override val schema: StructType = tableSchema

  // Rows returned by buildScan are already InternalRows (the inner
  // plan's toRdd): skip Spark's Row -> InternalRow conversion.
  override def needConversion: Boolean = false

  // Every pushed filter is re-checked by Spark above this scan; the
  // best-effort translation below is purely an inner-plan prefilter —
  // it reaches the parquet scan underneath the anti join, where
  // sidecar file pruning and row-group skipping fire.
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  override def buildScan(
      requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val base = org.apache.spark.sql.GraftBridge.ofRows(spark, nativePlan)
    val filtered = filters.flatMap(GraftSource.translateFilter)
      .foldLeft(base)(_ filter _)
    val projected =
      if (requiredColumns.isEmpty) filtered.select()
      else filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
    org.apache.spark.sql.GraftBridge.toInternalRdd(projected)
      .asInstanceOf[RDD[Row]]
  }
}

/** Analyzer rule (injected by [[graft.GraftExtensions]]): splice the
  * native merge-on-read plan in place of a [[DvPendingRelation]]
  * leaf, re-keying its output to the leaf's attribute ids. Runs in
  * the resolution fixed point, so `DeduplicateRelations` afterwards
  * re-keys duplicate subtrees (self-joins of the same DV table). */
final class DvScanSubstitution(session: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case lr: LogicalRelation
          if lr.relation.isInstanceOf[DvPendingRelation] =>
        val native = lr.relation.asInstanceOf[DvPendingRelation].nativePlan
        Project(lr.output.zip(native.output).map { case (o, a) =>
          Alias(a, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }, native)
    }
}
