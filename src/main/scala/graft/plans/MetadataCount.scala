package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.GraftFileIndex

import graft.core.Lex

/** Metadata-only ungrouped aggregates: the sidecar records every
  * file's exact row count and the optional `_graft_colstats.json`
  * sidecar records per-file (min, max, nulls) for chosen columns, so
  * an unfiltered, ungrouped aggregate mixing `count(*)`, and —
  * when every listed file carries a stats entry for the column —
  * `count(col)` / `min(col)` / `max(col)`, is a driver-side fold:
  * zero files read, zero tasks, at any table size. The relation's
  * [[GraftFileIndex]] carries both, so archived generations (time
  * travel) answer from THEIR sidecar just the same.
  *
  * Semantics match the engines they replace: min/max ignore nulls
  * (the stats store the non-null extrema; an all-null file
  * contributes nothing, an all-null table yields NULL), `count(col)`
  * is rows minus recorded nulls. Fires only on `Aggregate(no
  * grouping, only those shapes, bare scan)`: any Filter between
  * aggregate and scan, DISTINCT, a FILTER clause, a column without
  * complete stats coverage, or a float/double column (stats can't
  * order NaN the way the engine does) declines. Installed lazily
  * whenever a graft relation is created (idempotent), and via
  * `GraftExtensions` for extension-built sessions. */
object MetadataCount extends Rule[LogicalPlan] {

  private sealed trait MetaAgg
  private case object CountStar extends MetaAgg
  private final case class CountCol(a: AttributeReference) extends MetaAgg
  private final case class MinCol(a: AttributeReference) extends MetaAgg
  private final case class MaxCol(a: AttributeReference) extends MetaAgg

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
      val classified = aggExprs.map(classify)
      if (classified.exists(_.isEmpty)) agg
      else graftIndex(child) match {
        case Some(g) =>
          val answers = classified.map(_.get).map(answer(g, _))
          if (answers.exists(_.isEmpty)) agg
          else LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(answers.map(_.get))))
        case None => agg
      }
  }

  private def classify(e: NamedExpression): Option[MetaAgg] = e match {
    case Alias(AggregateExpression(
      Count(Seq(Literal(1, _))), Complete, false, None, _), _) =>
      Some(CountStar)
    case Alias(AggregateExpression(
      Count(Seq(a: AttributeReference)), Complete, false, None, _), _) =>
      Some(CountCol(a))
    case Alias(AggregateExpression(
      Min(a: AttributeReference), Complete, false, None, _), _) =>
      Some(MinCol(a))
    case Alias(AggregateExpression(
      Max(a: AttributeReference), Complete, false, None, _), _) =>
      Some(MaxCol(a))
    case _ => None
  }

  /** The metadata answer as an INTERNAL value (None = not answerable
    * from metadata; the aggregate stays). */
  private def answer(g: GraftFileIndex, m: MetaAgg): Option[Any] = m match {
    case CountStar => g.rowCounts.map(_.sum)
    case CountCol(a) => completeStats(g, a).flatMap { per =>
      g.rowCounts.map(_.sum - per.map(_._3).sum)
    }
    case MinCol(a) => completeStats(g, a).map { per =>
      fold(per.flatMap(_._1), a)
    }
    case MaxCol(a) => completeStats(g, a).map { per =>
      fold(per.flatMap(_._2), a, max = true)
    }
  }

  /** The column's raw stats when EVERY file carries an entry (a file
    * appended after the stats build has none — decline) and the type
    * totally orders without engine-specific NaN handling. */
  private def completeStats(
      g: GraftFileIndex, a: AttributeReference):
      Option[IndexedSeq[(Option[Any], Option[Any], Long)]] = {
    a.dataType match {
      case org.apache.spark.sql.types.FloatType |
          org.apache.spark.sql.types.DoubleType => return None
      case _ => ()
    }
    g.rawColStats.get(a.name)
      .filter(per => per.nonEmpty && per.forall(_.isDefined))
      .map(_.map(_.get))
  }

  private def fold(
      vals: Seq[Any], a: AttributeReference, max: Boolean = false): Any =
    if (vals.isEmpty) null // every file all-null: SQL min/max = NULL
    else {
      val ext = vals.reduce { (x, y) =>
        val c = Lex.valueCmp(x, y)
        if ((c <= 0) != max) x else y
      }
      CatalystTypeConverters.createToCatalystConverter(a.dataType)(ext)
    }

  private def graftIndex(p: LogicalPlan): Option[GraftFileIndex] = p match {
    case Project(projs, child)
        if projs.forall(_.isInstanceOf[AttributeReference]) =>
      graftIndex(child)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location match {
            case g: GraftFileIndex => Some(g)
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
