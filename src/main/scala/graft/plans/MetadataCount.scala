package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.GraftFileIndex

/** Metadata-only `count(*)`: the sidecar records every file's exact
  * row count, so an unfiltered, ungrouped `count(*)` over a graft
  * relation is a driver-side sum — zero files read, zero tasks, at
  * any table size. The relation's [[GraftFileIndex]] carries the
  * counts, so archived generations (time travel) answer from THEIR
  * sidecar just the same.
  *
  * Fires only on `Aggregate(no grouping, only count(*)/count(1)
  * aggregates, bare scan)`: any Filter between aggregate and scan,
  * `count(col)` (null-skipping), DISTINCT, or a FILTER clause
  * declines. Installed lazily whenever a graft relation is created
  * (idempotent), and via `GraftExtensions` for extension-built
  * sessions. */
object MetadataCount extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall(isCountStar) =>
      sidecarCount(child) match {
        case Some(n) =>
          LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(aggExprs.map(_ => n))))
        case None => agg
      }
  }

  private def isCountStar(
      e: org.apache.spark.sql.catalyst.expressions.NamedExpression): Boolean =
    e match {
      case Alias(AggregateExpression(
        Count(Seq(Literal(1, _))), Complete, false, None, _), _) => true
      case _ => false
    }

  /** The scan's total row count per its sidecar, when the child is a
    * bare (or column-pruning-projected) graft relation. */
  private def sidecarCount(p: LogicalPlan): Option[Long] = p match {
    case Project(projs, child)
        if projs.forall(_.isInstanceOf[AttributeReference]) =>
      sidecarCount(child)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location match {
            case g: GraftFileIndex => g.rowCounts.map(_.sum)
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  /** Install on the session's optimizer (idempotent). */
  def ensureRule(spark: SparkSession): Unit = {
    import org.apache.spark.sql.classic
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(MetadataCount))
      exp.extraOptimizations ++= Seq(MetadataCount)
  }
}
