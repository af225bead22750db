package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  ExprId, Literal, NamedExpression}
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
  * (per-file sums recorded by try_sum-based builds are EXACT in any
  * build eval mode; LEGACY reads fold with wrapping arithmetic —
  * bit-identical to the engine's wrap — while ANSI reads fold
  * overflow-checked, decline to the engine on overflow, and refuse
  * pre-exactness sums that may have wrapped at build time), is a
  * driver-side fold:
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
  * grouping, only those shapes, scan below column-forwarding
  * projections)`: a FILTER clause, a computed projection, a column
  * without complete stats coverage, or float/double `min`/`max`
  * (count/sum need no ordering and fold fine) declines. DISTINCT
  * declines too, except `count(DISTINCT c)` over a FILE-CONSTANT
  * column — the number of distinct non-null per-file constants.
  * Installed lazily whenever a graft relation is created
  * (idempotent), and via `GraftExtensions` for extension-built
  * sessions.
  *
  * A WHERE clause between aggregate and scan folds too when it is
  * FILE-ALIGNED: every file provably either fully satisfies the
  * predicate or is fully excluded by it (tri-state evaluation of
  * comparisons / IS [NOT] NULL / AND / OR against the leading index
  * column's head bounds and the column-stats ranges) — the
  * `count(*) WHERE event_date >= X` shape on a date-clustered table.
  * One partially-overlapping file, a NOT, or any unsupported
  * predicate shape declines to the normal scan.
  *
  * GROUPED aggregates fold too when the single grouping column is
  * provably CONSTANT within every file — the date/bucket-clustered
  * layout (leading index column with lb == ub per file, or a stats
  * column with min == max and zero nulls): each group's answer folds
  * over exactly its files, so `GROUP BY event_date` over a
  * date-clustered 100 TB table reads nothing. All-null files form
  * the SQL NULL group, zero-row files belong to no group, any file
  * straddling two group values declines, and group-key types are
  * restricted to those whose driver equality is SQL grouping
  * equality (float/double/decimal decline). */
object MetadataCount extends Rule[LogicalPlan] {

  private sealed trait MetaAgg
  private case object CountStar extends MetaAgg
  private final case class GroupKey(a: AttributeReference) extends MetaAgg
  private final case class CountCol(a: AttributeReference) extends MetaAgg
  private final case class MinCol(a: AttributeReference) extends MetaAgg
  private final case class MaxCol(a: AttributeReference) extends MetaAgg
  private final case class SumCol(
      a: AttributeReference, ansi: Boolean) extends MetaAgg
  private final case class DistinctCountCol(
      a: AttributeReference) extends MetaAgg

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
      val classified = aggExprs.map(classify)
      if (classified.exists(_.isEmpty)) agg
      else childInfo(child) match {
        case Some((g, names, kept)) =>
          val answers = classified.map(_.get).map(answer(g, names, _, kept))
          if (answers.exists(_.isEmpty)) agg
          else LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(answers.map(_.get))))
        case None => agg
      }
    // Grouped fold: GROUP BY columns that are each CONSTANT within
    // every (kept) file — the date/bucket-clustered layout where each
    // file belongs to exactly one group (leading index column with
    // lb == ub, or a stats column with min == max and no nulls). Each
    // group's aggregates then fold over just its files: a 100 TB
    // `GROUP BY event_date, source` over a clustered table answers
    // with zero files read; `SELECT DISTINCT event_date` is the
    // aggregate-free case. A file straddling two group values
    // declines.
    case agg @ Aggregate(gks, aggExprs, child, _)
        if gks.nonEmpty && aggExprs.nonEmpty &&
          gks.forall(_.isInstanceOf[AttributeReference]) =>
      val gkAttrs = gks.map(_.asInstanceOf[AttributeReference])
        .toIndexedSeq
      val gkIds = gkAttrs.map(_.exprId).toSet
      val classified = aggExprs.map {
        case a: AttributeReference if gkIds(a.exprId) =>
          Some(GroupKey(a))
        case Alias(a: AttributeReference, _) if gkIds(a.exprId) =>
          Some(GroupKey(a))
        case e => classify(e)
      }
      if (classified.exists(_.isEmpty)) agg
      else childInfo(child) match {
        case Some((g, names, kept)) =>
          val valsPerKey = {
            val each = gkAttrs.map(a =>
              groupValues(g, names, a, kept).map(a.exprId -> _))
            if (each.exists(_.isEmpty)) None
            else Some(each.flatten.toMap)
          }
          (valsPerKey, g.rowCounts) match {
            case (Some(vals), Some(rc)) =>
              // zero-row files belong to no group (the engine emits
              // no row for them); rowCounts gate the whole fold
              val keyed = kept.filter(rc(_) > 0L)
                .groupBy(i => gkAttrs.map(a => vals(a.exprId)(i)))
                .toIndexedSeq
              val toKey = gkAttrs.map(a => a.exprId ->
                CatalystTypeConverters
                  .createToCatalystConverter(a.dataType)).toMap
              val rows = keyed.map { case (tuple, idxs) =>
                val byId = gkAttrs.map(_.exprId).zip(tuple).toMap
                val answers = classified.map(_.get).map {
                  case GroupKey(a) =>
                    Some(toKey(a.exprId)(byId(a.exprId).orNull))
                  case m => answer(g, names, m, idxs)
                }
                if (answers.exists(_.isEmpty)) None
                else Some(InternalRow.fromSeq(answers.map(_.get)))
              }
              if (rows.exists(_.isEmpty)) agg
              else LocalRelation(agg.output, rows.map(_.get))
            case _ => agg
          }
        case None => agg
      }
  }

  /** The scan's index, attribute-name map, and the file indices the
    * child plan provably keeps WHOLLY: column-forwarding projections
    * pass through, and a Filter folds in when every file is either
    * fully satisfied or fully excluded by it ([[alignedKeep]]) — the
    * file-aligned `count(*) WHERE event_date >= X` shape. Any
    * partially-overlapping file, unsupported predicate, or other
    * node declines. */
  private def childInfo(p: LogicalPlan):
      Option[(GraftFileIndex, Map[ExprId, String], IndexedSeq[Int])] =
    p match {
      case Project(projs, child) =>
        childInfo(child).flatMap { case (g, below, kept) =>
          val mapped = projs.map {
            case a: AttributeReference =>
              below.get(a.exprId).map(a.exprId -> _)
            case al @ Alias(a: AttributeReference, _) =>
              below.get(a.exprId).map(al.exprId -> _)
            case _ => None
          }
          if (mapped.exists(_.isEmpty)) None
          else Some((g, mapped.flatten.toMap, kept))
        }
      case org.apache.spark.sql.catalyst.plans.logical
          .Filter(cond, child) =>
        childInfo(child).flatMap { case (g, names, kept) =>
          // file-aligned filters need exact per-file row counts to
          // drop zero-row files from the kept set; only files a LOWER
          // stacked filter still keeps need a non-Partial
          // classification (an excluded file's rows are never read, so
          // its Partial verdict cannot affect the fold)
          g.rowCounts.flatMap { rc =>
            alignedKeep(g, names, cond, kept).map { keepsAll =>
              (g, names, kept.filter(i => rc(i) > 0L && keepsAll(i)))
            }
          }
        }
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location match {
              case g: GraftFileIndex =>
                Some((g, lr.output.map(a => a.exprId -> a.name).toMap,
                  g.headBounds.indices))
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }

  /** Per-file known column facts for tri-state predicate evaluation:
    * non-null extrema (None = unknown / all-null), whether nulls MAY
    * be present, and whether every row is provably null. */
  private final case class ColFacts(
      min: Option[Any], max: Option[Any],
      mayNull: Boolean, allNull: Boolean)

  private def colFacts(
      g: GraftFileIndex, col: String): Option[Int => ColFacts] =
    if (g.leadingColumn.contains(col)) {
      val hb = g.headBounds
      // null-first head bounds: lb None = nulls possible; both None =
      // every row null
      Some(i => {
        val (lb, ub) = hb(i)
        ColFacts(lb, ub, mayNull = lb.isEmpty,
          allNull = lb.isEmpty && ub.isEmpty)
      })
    } else g.rawColStats.get(col)
      .filter(per => per.nonEmpty && per.forall(_.isDefined))
      .map(per => (i: Int) => {
        val s = per(i).get
        ColFacts(s.min, s.max, mayNull = s.nulls > 0L,
          allNull = s.min.isEmpty && s.max.isEmpty)
      })

  /** TRUE-semantics tri-state per file: Full = every row satisfies
    * the predicate, Empty = no row does (rows evaluating NULL count
    * as not satisfying — Filter drops them), Partial = can't prove
    * either. */
  private sealed trait Tri
  private case object Full extends Tri
  private case object Empty extends Tri
  private case object Partial extends Tri

  /** Per-file whole-file keep classification of `cond` over the files
    * in `kept`; None = some KEPT file is Partial or the predicate has
    * an unsupported shape (decline the fold) — files a lower stacked
    * filter already excluded need no classification. NOT is
    * unsupported: `NOT p` is true only where p is FALSE, and these
    * facts track only where p is TRUE — null rows would flip
    * unsoundly. */
  private def alignedKeep(
      g: GraftFileIndex, names: Map[ExprId, String],
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      kept: IndexedSeq[Int]):
      Option[Int => Boolean] = {
    import org.apache.spark.sql.catalyst.expressions._
    def litVal(l: Literal): Option[Any] =
      Option(l.value).flatMap(v => scala.util.Try(
        CatalystTypeConverters.convertToScala(v, l.dataType)).toOption)
    def comparableType(
        dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      // float/double decline: NaN ordering in SQL comparisons differs
      // from a naive driver compare
      case org.apache.spark.sql.types.FloatType |
          org.apache.spark.sql.types.DoubleType => false
      case _ => true
    }
    def facts(a: AttributeReference): Option[Int => ColFacts] =
      if (!comparableType(a.dataType)) None
      else names.get(a.exprId).flatMap(colFacts(g, _))
    def cmpTri(a: AttributeReference, l: Literal, op: String):
        Option[Int => Tri] =
      for { f <- facts(a); x <- litVal(l) } yield (i: Int) => {
        val c = f(i)
        def cmp(v: Any): Option[Int] =
          scala.util.Try(Lex.valueCmp(v, x)).toOption
        def all(p: Int => Boolean, edge: Option[Any]): Boolean =
          !c.mayNull && !c.allNull && edge.flatMap(cmp).exists(p)
        def none(p: Int => Boolean, edge: Option[Any]): Boolean =
          c.allNull || edge.flatMap(cmp).exists(p)
        val (isAll, isNone) = op match {
          // ALL compares the adverse extreme; NONE the favorable one
          case ">=" => (all(_ >= 0, c.min), none(_ < 0, c.max))
          case ">"  => (all(_ > 0, c.min), none(_ <= 0, c.max))
          case "<=" => (all(_ <= 0, c.max), none(_ > 0, c.min))
          case "<"  => (all(_ < 0, c.max), none(_ >= 0, c.min))
          case "=" =>
            (!c.mayNull && !c.allNull &&
              c.min.flatMap(cmp).contains(0) &&
              c.max.flatMap(cmp).contains(0),
              c.allNull || c.max.flatMap(cmp).exists(_ < 0) ||
                c.min.flatMap(cmp).exists(_ > 0))
        }
        if (isAll) Full else if (isNone) Empty else Partial
      }
    def orAll(fs: Seq[Int => Tri]): Int => Tri = (i: Int) => {
      var anyFull = false
      var allEmpty = true
      fs.foreach(f => f(i) match {
        case Full => anyFull = true; allEmpty = false
        case Partial => allEmpty = false
        case Empty => ()
      })
      if (anyFull) Full else if (allEmpty) Empty else Partial
    }
    def tri(e: Expression): Option[Int => Tri] = e match {
      case And(l, r) => for { a <- tri(l); b <- tri(r) } yield
        (i: Int) => (a(i), b(i)) match {
          case (Full, Full) => Full
          case (Empty, _) | (_, Empty) => Empty
          case _ => Partial
        }
      case Or(l, r) => for { a <- tri(l); b <- tri(r) } yield
        (i: Int) => (a(i), b(i)) match {
          case (Full, _) | (_, Full) => Full
          case (Empty, Empty) => Empty
          case _ => Partial
        }
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        cmpTri(a, l, ">=")
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        cmpTri(a, l, "<=")
      case GreaterThan(a: AttributeReference, l: Literal) =>
        cmpTri(a, l, ">")
      case GreaterThan(l: Literal, a: AttributeReference) =>
        cmpTri(a, l, "<")
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        cmpTri(a, l, "<=")
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        cmpTri(a, l, ">=")
      case LessThan(a: AttributeReference, l: Literal) =>
        cmpTri(a, l, "<")
      case LessThan(l: Literal, a: AttributeReference) =>
        cmpTri(a, l, ">")
      case EqualTo(a: AttributeReference, l: Literal) => cmpTri(a, l, "=")
      case EqualTo(l: Literal, a: AttributeReference) => cmpTri(a, l, "=")
      // IN = OR of equalities under TRUE-semantics (a null element is
      // never TRUE and litVal declines it conservatively)
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val each = vs.map(v => cmpTri(a, v.asInstanceOf[Literal], "="))
        if (each.exists(_.isEmpty)) None
        else Some(orAll(each.map(_.get)))
      case InSet(a: AttributeReference, hset) if hset.nonEmpty =>
        val each = hset.toSeq.map(v =>
          cmpTri(a, Literal(v, a.dataType), "="))
        if (each.exists(_.isEmpty)) None
        else Some(orAll(each.map(_.get)))
      case IsNotNull(a: AttributeReference) => facts(a).map(f =>
        (i: Int) => {
          val c = f(i)
          if (!c.mayNull && !c.allNull) Full
          else if (c.allNull) Empty else Partial
        })
      case IsNull(a: AttributeReference) => facts(a).map(f =>
        (i: Int) => {
          val c = f(i)
          if (c.allNull) Full
          else if (!c.mayNull) Empty else Partial
        })
      case _ => None
    }
    tri(cond).flatMap { f =>
      val per: Map[Int, Tri] = kept.map(i => i -> f(i)).toMap
      if (per.valuesIterator.contains(Partial)) None
      else Some((i: Int) => per.get(i).contains(Full))
    }
  }

  /** Per-file group value of `gk` (inner None = the NULL group), when
    * every KEPT file is provably single-valued in it; None = not
    * derivable (decline). Sources: the leading index column's scalar
    * head bounds, else complete column stats. Group-key types are
    * restricted to those whose driver-side equality matches SQL
    * grouping exactly (float/double NaN/-0.0 normalization and
    * decimal scale-equality make those decline). Returns a TOTAL
    * per-file map (indexed like the sidecar); callers index it by
    * their kept set. */
  private def groupValues(
      g: GraftFileIndex, names: Map[ExprId, String],
      gk: AttributeReference,
      kept: IndexedSeq[Int]): Option[IndexedSeq[Option[Any]]] = {
    import org.apache.spark.sql.types._
    val groupable = gk.dataType match {
      case ByteType | ShortType | IntegerType | LongType | BooleanType |
          StringType | DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    if (!groupable) return None
    names.get(gk.exprId).flatMap { col =>
      def fromBounds(per: IndexedSeq[(Option[Any], Option[Any])]):
          Option[IndexedSeq[Option[Any]]] = {
        val keptSet = kept.toSet
        val vals = per.indices.map { i =>
          per(i) match {
            case (Some(lo), Some(hi)) if Lex.valueCmp(lo, hi) == 0 =>
              Some(Some(lo))
            case (None, None) => Some(None) // all-null: the NULL group
            // straddling values / mixed nulls decline — unless the
            // file was already filtered out (its value is never read)
            case _ => if (keptSet(i)) None else Some(None)
          }
        }
        if (vals.exists(_.isEmpty)) None else Some(vals.map(_.get))
      }
      if (g.leadingColumn.contains(col)) fromBounds(g.headBounds)
      else completeStats(g, names, gk).flatMap { per =>
        fromBounds(per.map(s =>
          (if (s.nulls == 0L) s.min else None, s.max)))
      }
    }
  }

  private def classify(e: NamedExpression): Option[MetaAgg] = e match {
    case Alias(AggregateExpression(
      Count(Seq(Literal(1, _))), Complete, false, None, _), _) =>
      Some(CountStar)
    case Alias(AggregateExpression(
      Count(Seq(a: AttributeReference)), Complete, false, None, _), _) =>
      Some(CountCol(a))
    // count(DISTINCT c) folds when c is file-constant (the number of
    // distinct non-null per-file constants); groupValues supplies the
    // same soundness proof the grouped fold uses
    case Alias(AggregateExpression(
      Count(Seq(a: AttributeReference)), Complete, true, None, _), _) =>
      Some(DistinctCountCol(a))
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

  /** The metadata answer over the files in `idxs` as an INTERNAL
    * value (None = not answerable from metadata; the aggregate
    * stays). The ungrouped fold passes every file; the grouped fold
    * passes one group's files. `names` maps each attribute the
    * aggregate may reference (possibly through alias-only
    * projections) to its underlying relation column name. Coverage
    * requirements (complete stats, recorded sums) stay TABLE-wide —
    * every file belongs to some group, so subsetting never weakens
    * them. */
  private def answer(
      g: GraftFileIndex, names: Map[ExprId, String],
      m: MetaAgg, idxs: IndexedSeq[Int]): Option[Any] = m match {
    case CountStar => g.rowCounts.map(rc => idxs.map(rc).sum)
    // count ignores ordering entirely (it needs only null counts), so
    // float/double columns fold here even though min/max decline
    case CountCol(a) => completeStats(g, names, a).flatMap { per =>
      g.rowCounts.map(rc => idxs.map(rc).sum - idxs.map(per(_).nulls).sum)
    }
    case MinCol(a) if exactlyOrdered(a.dataType) =>
      completeStats(g, names, a).map(per =>
        fold(idxs.flatMap(per(_).min), a))
    case MaxCol(a) if exactlyOrdered(a.dataType) =>
      completeStats(g, names, a).map(per =>
        fold(idxs.flatMap(per(_).max), a, max = true))
    case SumCol(a, ansi) => completeStats(g, names, a)
      // every file must carry a RECORDED sum (integral column, stats
      // built by a sum-aware version); all-null files contribute no
      // term, an all-null table sums to NULL. An ANSI read further
      // requires EXACT sums (try_sum builds): a pre-exactness sum may
      // have wrapped under a LEGACY build session, and folding it
      // overflow-checked would silently return the wrapped value
      // where the engine's own scan raises ARITHMETIC_OVERFLOW.
      .filter(per => per.forall(_.sum.isDefined) &&
        (!ansi || per.forall(_.sumExact)))
      .flatMap { per =>
        val terms = idxs.flatMap(per(_).sum.get)
        if (terms.isEmpty) Some(null)
        else if (!ansi) Some(Long.box(terms.sum))
        else scala.util.Try(
          Long.box(terms.reduce(Math.addExact(_, _)))).toOption
      }
    case DistinctCountCol(a) =>
      for {
        vals <- groupValues(g, names, a, idxs)
        rc <- g.rowCounts
      } yield Long.box(idxs.filter(rc(_) > 0L).map(vals(_))
        .filter(_.isDefined).distinct.size.toLong)
    // GroupKey (answered by the grouped fold directly) and
    // guard-failing min/max (float/double ordering) decline here
    case _ => None
  }

  /** min/max decline on float/double: the recorded per-file extrema
    * follow Spark's NaN-greatest SQL ordering, but codegen min/max
    * over raw primitives treat -0.0 == 0.0 (first-seen wins), so a
    * driver fold cannot promise the bit-exact value the scan would
    * produce. count/sum are unaffected. */
  private def exactlyOrdered(dt: org.apache.spark.sql.types.DataType)
      : Boolean = dt match {
    case org.apache.spark.sql.types.FloatType |
        org.apache.spark.sql.types.DoubleType => false
    case _ => true
  }

  /** The column's raw stats when EVERY file carries an entry (a file
    * appended after the stats build has none — decline). */
  private def completeStats(
      g: GraftFileIndex, names: Map[ExprId, String],
      a: AttributeReference):
      Option[IndexedSeq[graft.core.ColumnStats.FileColStats]] =
    names.get(a.exprId).flatMap(g.rawColStats.get)
      .filter(per => per.nonEmpty && per.forall(_.isDefined))
      .map(_.map(_.get))

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

  /** Install on the session's optimizer (idempotent). */
  def ensureRule(spark: SparkSession): Unit = {
    import org.apache.spark.sql.classic
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(MetadataCount))
      exp.extraOptimizations ++= Seq(MetadataCount)
  }
}
