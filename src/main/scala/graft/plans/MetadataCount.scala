package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min, Sum}
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
  * `count(col)` / `min(col)` / `max(col)` / integral `sum(col)`
  * (per-file sums recorded by sum-aware builds, under the BUILD
  * session's eval mode; LEGACY reads fold with the same wrapping
  * arithmetic, ANSI reads fold overflow-checked and decline to the
  * engine on overflow), is a driver-side fold:
  * zero files read, zero tasks, at any table size. The relation's
  * [[GraftFileIndex]] carries both, so archived generations (time
  * travel) answer from THEIR sidecar just the same.
  *
  * `avg` deliberately declines even over covered integral columns:
  * the engine accumulates a DOUBLE buffer row by row (order-dependent
  * rounding), which a fold of exact per-file integer sums cannot
  * reproduce bit-exactly — and a metadata answer must be
  * indistinguishable from the scan it replaces.
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
  private final case class SumCol(
      a: AttributeReference, ansi: Boolean) extends MetaAgg

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
    // LEGACY folds with the same wrapping arithmetic the engine uses;
    // ANSI (Spark 4's default) folds overflow-CHECKED and declines on
    // overflow, handing the query back to the engine to raise its own
    // ARITHMETIC_OVERFLOW. TRY (null-on-overflow) declines outright.
    case Alias(AggregateExpression(
      s @ Sum(a: AttributeReference, _), Complete, false, None, _), _)
        if s.evalContext.evalMode !=
          org.apache.spark.sql.catalyst.expressions.EvalMode.TRY =>
      Some(SumCol(a, ansi = s.evalContext.evalMode ==
        org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI))
    case _ => None
  }

  /** The metadata answer as an INTERNAL value (None = not answerable
    * from metadata; the aggregate stays). */
  private def answer(g: GraftFileIndex, m: MetaAgg): Option[Any] = m match {
    case CountStar => g.rowCounts.map(_.sum)
    case CountCol(a) => completeStats(g, a).flatMap { per =>
      g.rowCounts.map(_.sum - per.map(_.nulls).sum)
    }
    case MinCol(a) => completeStats(g, a).map { per =>
      fold(per.flatMap(_.min), a)
    }
    case MaxCol(a) => completeStats(g, a).map { per =>
      fold(per.flatMap(_.max), a, max = true)
    }
    case SumCol(a, ansi) => completeStats(g, a)
      // every file must carry a RECORDED sum (integral column, stats
      // built by a sum-aware version); all-null files contribute no
      // term, an all-null table sums to NULL
      .filter(_.forall(_.sum.isDefined))
      .flatMap { per =>
        val terms = per.flatMap(_.sum.get)
        if (terms.isEmpty) Some(null)
        else if (!ansi) Some(Long.box(terms.sum))
        else scala.util.Try(
          Long.box(terms.reduce(Math.addExact(_, _)))).toOption
      }
  }

  /** The column's raw stats when EVERY file carries an entry (a file
    * appended after the stats build has none — decline) and the type
    * totally orders without engine-specific NaN handling. */
  private def completeStats(
      g: GraftFileIndex, a: AttributeReference):
      Option[IndexedSeq[graft.core.ColumnStats.FileColStats]] = {
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
