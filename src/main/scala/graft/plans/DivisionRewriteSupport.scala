package graft.plans

import org.apache.spark.sql.{GraftFileIndex, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Cast, EqualNullSafe, Expression, ExprId, GreaterThan, GreaterThanOrEqual, IsNull, LessThan, Literal, NamedExpression, Not, Or, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.core.Lex.Bound

/** Shared machinery for the optimizer rules that rewrite SQL plans
  * onto the engine's range-division structure ([[SqlDivisionJoin]],
  * [[SqlDivisionAgg]]): recognizing a graft read under deterministic
  * Project/Filter chains, fresh-ExprId plan copies for the per-
  * division children, and resolved-catalyst lex range predicates.
  *
  * The rules run POST-analysis, so the predicates are built as
  * already-resolved catalyst trees — same null-first lex recursion as
  * [[graft.core.LexColumns]]' Column builders (padawan
  * ordering.py:5-66) but with TOTAL-ORDER null handling in the
  * equality branch (see [[eqBranch]] — the ranges must tile), and
  * literals cast to the key's type (the analyzer's coercion won't
  * run over them).
  */
private[plans] trait DivisionRewriteSupport {

  protected def session: SparkSession

  /** The graft relation (and its file index) under a chain of
    * deterministic Project/Filter nodes — None for any other shape. */
  protected def graftLeaf(
      p: LogicalPlan): Option[(LogicalRelation, GraftFileIndex)] =
    p match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case g: GraftFileIndex => Some((lr, g))
          case _ => None
        }
        case _ => None
      }
      // a chain node holding a subquery is inadmissible: freshCopy
      // would duplicate the subquery's PLAN across division children
      // with its internal ExprIds shared
      case f: Filter if f.condition.deterministic &&
          !f.condition.exists(_.isInstanceOf[SubqueryExpression]) =>
        graftLeaf(f.child)
      case pr: Project if pr.projectList.forall(e =>
          e.deterministic &&
            !e.exists(_.isInstanceOf[SubqueryExpression])) =>
        graftLeaf(pr.child)
      case _ => None
    }

  /** Fresh-ExprId copy of a Project/Filter/LogicalRelation chain (the
    * only shapes [[graftLeaf]] admits); returns the copy plus the
    * old→new attribute mapping for rewriting references above it. */
  protected def freshCopy(
      p: LogicalPlan): (LogicalPlan, Map[ExprId, Attribute]) = p match {
    case lr: LogicalRelation =>
      val fresh = lr.newInstance()
      (fresh, lr.output.map(_.exprId).zip(fresh.output).toMap)
    case f: Filter =>
      val (ch, m) = freshCopy(f.child)
      (Filter(remap(f.condition, m), ch), m)
    case pr: Project =>
      val (ch, m0) = freshCopy(pr.child)
      var m = m0
      val list: Seq[NamedExpression] = pr.projectList.map {
        case al: Alias =>
          val na = Alias(remap(al.child, m0), al.name)()
          m += (al.exprId -> na.toAttribute)
          na
        case a: Attribute =>
          m0.get(a.exprId).getOrElse(a)
        case other => // unreachable given graftLeaf's admission
          remap(other, m0).asInstanceOf[NamedExpression]
      }
      (Project(list, ch), m)
    case other =>
      throw new IllegalStateException(
        s"freshCopy over unexpected node ${other.nodeName}")
  }

  protected def remap(
      e: Expression, m: Map[ExprId, Attribute]): Expression =
    e.transform {
      case a: Attribute => m.getOrElse(a.exprId, a)
    }

  // ---- resolved-catalyst lex range predicates ----

  private def litFor(a: Attribute, v: Any): Expression = {
    val l = Literal(v)
    if (l.dataType == a.dataType) l
    else Cast(l, a.dataType,
      Some(session.sessionState.conf.sessionLocalTimeZone))
  }
  private def nullLt(c: Attribute, v: Option[Any]): Expression = v match {
    case None => Literal.FalseLiteral
    case Some(x) => Or(IsNull(c), LessThan(c, litFor(c, x)))
  }
  private def nullGt(c: Attribute, v: Option[Any]): Expression = v match {
    case None => Not(IsNull(c))
    case Some(x) => GreaterThan(c, litFor(c, x))
  }
  private def nullGeq(c: Attribute, v: Option[Any]): Expression = v match {
    case None => Literal.TrueLiteral
    case Some(x) => GreaterThanOrEqual(c, litFor(c, x))
  }
  // The equal-at-this-position branch uses TOTAL-ORDER null
  // semantics (`IsNull` / null-safe equality), NOT the reference's
  // null-propagating `===` that [[graft.core.LexColumns]] keeps for
  // slice parity: the division ranges must TILE — every row,
  // null-keyed or not, falls in exactly one range. Null-propagating
  // equality made a row null at a position where the bound holds a
  // null fall in NO range (the equal-branch evaluated to null on both
  // sides of the boundary), silently dropping it from a division
  // aggregate/window — masked in the inner join, where null keys
  // never match anyway.
  private def eqBranch(c: Attribute, v: Option[Any]): Expression = v match {
    case None => IsNull(c)
    case Some(x) => EqualNullSafe(c, litFor(c, x))
  }
  private def lexRecurse(
      cols: Seq[Attribute], bound: Seq[Option[Any]],
      leaf: (Attribute, Option[Any]) => Expression,
      step: (Attribute, Option[Any]) => Expression): Expression =
    if (cols.length == 1) leaf(cols.head, bound.head)
    else Or(step(cols.head, bound.head),
      And(eqBranch(cols.head, bound.head),
        lexRecurse(cols.tail, bound.tail, leaf, step)))

  /** `lo <= lex(keys) < hi` (None sentinel = unbounded side). A bound
    * SHORTER than `keys` compares on its own prefix only — rows equal
    * on the prefix compare equal, so a prefix boundary never splits a
    * prefix-value group. */
  protected def rangePred(
      keys: Seq[Attribute],
      lo: Option[Bound],
      hi: Option[Bound]): Expression = {
    val conds =
      lo.map(b => lexRecurse(keys.take(b.length), b, nullGeq, nullGt))
        .toSeq ++
        hi.map(b => lexRecurse(keys.take(b.length), b, nullLt, nullLt))
          .toSeq
    conds.reduceOption(And(_, _)).getOrElse(Literal.TrueLiteral)
  }

  /** Cost-model floor for the single-relation division rewrites
    * (aggregate/window/sort): below this many relation bytes the
    * Exchange being elided is cheaper than the rewrite's fixed cost —
    * a g-branch Union pays ~90 ms of SERIAL driver-side whole-stage
    * codegen per branch while the union RDD is built (each branch's
    * range literals make a distinct codegen unit; measured in
    * `examples/DivisionSqlBench`: ~6 s fixed at g=64,
    * data-independent), and the engine's own internal maintenance
    * queries regressed 2-7× under an ungated rewrite. The crossover
    * is where shuffle cost beats g×90 ms: local memory-speed shuffles
    * need tens of GB, a real cluster's network fabric far less, and
    * at the 100 TB design point (g capped at 256 → ~23 s of driver
    * work vs hours of Exchange) the gate is always clear.
    * `SET spark.graft.sql.divisionMinBytes=0` pins the rewrite on
    * for tests and small-data demos. */
  protected def divisionMinBytes: Long =
    session.sessionState.conf
      .getConfString("spark.graft.sql.divisionMinBytes",
        (1L << 30).toString).toLong

  /** Merge `bounds` (sorted, distinct interior division boundaries)
    * down to at most `maxD` ranges, tiled with unbounded sentinels:
    * returns `g+1` edges for `g` divisions. */
  protected def mergedEdges(
      bounds: IndexedSeq[Bound], maxD: Int): IndexedSeq[Option[Bound]] = {
    val nDiv = bounds.length + 1
    val g = math.min(nDiv, maxD)
    if (g == nDiv) (None +: bounds.map(Some(_))) :+ None
    else (None +: (1 until g).map(j =>
      Some(bounds((j.toLong * nDiv / g).toInt - 1)))) :+ None
  }
}
