package graft.plans

import org.apache.spark.sql.{GraftFileIndex, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, EqualTo, Expression, ExprId, GreaterThan, GreaterThanOrEqual, IsNull, LessThan, Literal, NamedExpression, Not, Or, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.core.Lex
import graft.core.Lex.Bound

/** Automatic SHUFFLE-FREE SQL joins between co-clustered graft
  * tables.
  *
  * `SELECT ... FROM graft.db.a JOIN graft.db.b ON a.k = b.k` between
  * two tables range-clustered on their join keys is already
  * co-partitioned: division i of one side can only match division i
  * of the other, so Spark's sort-merge join — two full shuffles plus
  * two sorts of data that is ALREADY globally sorted on the key — is
  * pure waste. At 100 TB per side, those two Exchanges are the whole
  * query cost. This optimizer rule detects the shape and rewrites the
  * join onto the engine's [[DivisionJoinPlan]], the same zero-Exchange
  * node `PDataset.join` plans, slicing each side into contiguous key
  * ranges with the lex predicates the sidecar file-pruning
  * understands — each division child scans only its own files.
  *
  * Eligibility (anything else leaves the join untouched):
  *   - INNER join, no join hints (a user's BROADCAST hint wins);
  *   - each side is a graft relation ([[GraftFileIndex]] listing,
  *     i.e. a `format("graft")` read or a spliced catalog read),
  *     optionally under deterministic Project/Filter nodes;
  *   - the ON clause pairs, for every index position i, the LEFT
  *     index column i with the RIGHT index column i by bare attribute
  *     equality (both sides clustered the same way); further
  *     deterministic conjuncts are kept as a post-join Filter — valid
  *     for inner joins;
  *   - both sides exceed the autoBroadcastJoinThreshold (a broadcast
  *     join beats everything when one side fits in memory) and the
  *     merged division count reaches the cluster-utilization minimum
  *     (`PDataset.divisionJoinMinDivisions`).
  *
  * Correctness does not depend on the pruning: each division child is
  * `Filter(lo <= lex(keys) < hi, side)` over the FULL relation, the
  * ranges tile (-inf, +inf), and rows fall in exactly one range
  * (null-first lex order, same [[LexColumns]] predicates `slice`
  * uses) — file skipping through [[GraftFileIndex]] is what makes
  * each child O(its own files) instead of O(all files).
  *
  * Disable with `SET spark.graft.sql.divisionJoin=false`.
  */
final class SqlDivisionJoin(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    session.sessionState.conf
      .getConfString("spark.graft.sql.divisionJoin", "true")
      .equalsIgnoreCase("true")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), JoinHint(None, None)) =>
        rewrite(j).getOrElse(j)
    }
  }

  /** The graft relation (and its file index) under a chain of
    * deterministic Project/Filter nodes — None for any other shape. */
  private def graftLeaf(
      p: LogicalPlan): Option[(LogicalRelation, GraftFileIndex)] =
    p match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case g: GraftFileIndex => Some((lr, g))
          case _ => None
        }
        case _ => None
      }
      case f: Filter if f.condition.deterministic => graftLeaf(f.child)
      case pr: Project if pr.projectList.forall(_.deterministic) =>
        graftLeaf(pr.child)
      case _ => None
    }

  /** Fresh-ExprId copy of a Project/Filter/LogicalRelation chain (the
    * only shapes [[graftLeaf]] admits); returns the copy plus the
    * old→new attribute mapping for rewriting references above it. */
  private def freshCopy(
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

  private def remap(e: Expression, m: Map[ExprId, Attribute]): Expression =
    e.transform {
      case a: Attribute => m.getOrElse(a.exprId, a)
    }

  // ---- resolved-catalyst lex range predicates ----
  // The rule runs POST-analysis, so the predicates are built as
  // already-resolved catalyst trees — same recursion and null-first
  // semantics as [[graft.core.LexColumns]]' Column builders (padawan
  // ordering.py:5-66), with literals cast to the key's type (the
  // analyzer's coercion won't run over them).

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
  private def eqBranch(c: Attribute, v: Option[Any]): Expression = v match {
    case None => Literal(null, org.apache.spark.sql.types.BooleanType)
    case Some(x) => EqualTo(c, litFor(c, x))
  }
  private def lexRecurse(
      cols: Seq[Attribute], bound: Seq[Option[Any]],
      leaf: (Attribute, Option[Any]) => Expression,
      step: (Attribute, Option[Any]) => Expression): Expression =
    if (cols.length == 1) leaf(cols.head, bound.head)
    else Or(step(cols.head, bound.head),
      And(eqBranch(cols.head, bound.head),
        lexRecurse(cols.tail, bound.tail, leaf, step)))

  /** `lo <= lex(keys) < hi` (None sentinel = unbounded side). */
  private def rangePred(
      keys: Seq[Attribute],
      lo: Option[Bound],
      hi: Option[Bound]): Expression = {
    val conds =
      lo.map(b => lexRecurse(keys, b, nullGeq, nullGt)).toSeq ++
        hi.map(b => lexRecurse(keys, b, nullLt, nullLt)).toSeq
    conds.reduceOption(And(_, _)).getOrElse(Literal.TrueLiteral)
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val (l, r) = (j.left, j.right)
    val (lRel, lIdx) = graftLeaf(l).getOrElse(return None)
    val (rRel, rIdx) = graftLeaf(r).getOrElse(return None)
    val keyNames = lIdx.lexIndexColumns
    if (keyNames.isEmpty || rIdx.lexIndexColumns.length != keyNames.length)
      return None
    // a self-join's sides already carry distinct ExprIds post-analysis;
    // anything else sharing ids would alias attributes across sides
    if (l.outputSet.intersect(r.outputSet).nonEmpty) return None

    val resolver = session.sessionState.conf.resolver
    def keyAttrs(rel: LogicalRelation, side: LogicalPlan,
        names: Seq[String]): Option[Seq[Attribute]] = {
      val attrs = names.map(n => rel.output.find(a => resolver(a.name, n)))
      if (attrs.exists(_.isEmpty)) None
      else {
        val got = attrs.map(_.get)
        // the index attrs must flow through the chain unchanged
        // (an alias re-keys them; then division slicing by the
        // relation attr no longer matches the join key)
        if (got.forall(side.outputSet.contains)) Some(got) else None
      }
    }
    val lKeys = keyAttrs(lRel, l, keyNames).getOrElse(return None)
    val rKeys = keyAttrs(rRel, r, rIdx.lexIndexColumns)
      .getOrElse(return None)

    // ON must pair left index i with right index i (same clustering
    // position — co-partitioning is positional); other deterministic
    // conjuncts survive as a post-join filter.
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    if (conjuncts.exists(!_.deterministic)) return None
    def pairs(e: Expression): Option[(ExprId, ExprId)] = e match {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (l.outputSet.contains(a) && r.outputSet.contains(b))
          Some((a.exprId, b.exprId))
        else if (l.outputSet.contains(b) && r.outputSet.contains(a))
          Some((b.exprId, a.exprId))
        else None
      case _ => None
    }
    val eqPairs = conjuncts.flatMap(pairs).toSet
    val keyPaired = keyNames.indices.forall(i =>
      eqPairs.contains((lKeys(i).exprId, rKeys(i).exprId)))
    if (!keyPaired) return None
    val residual = conjuncts.filterNot(c => pairs(c).exists(p =>
      keyNames.indices.exists(i =>
        p == (lKeys(i).exprId, rKeys(i).exprId))))

    // Cost gates: a broadcastable side beats everything; too few
    // divisions under-utilizes one-task-per-range.
    val conf = session.sessionState.conf
    val thresh = conf.autoBroadcastJoinThreshold
    if (thresh >= 0 && (l.stats.sizeInBytes <= thresh ||
        r.stats.sizeInBytes <= thresh)) return None
    val divisions = (lIdx.lexLowerBounds ++ rIdx.lexLowerBounds)
      .distinct.sorted(Lex.boundOrdering)
    val nDiv = divisions.length + 1
    val maxD = graft.core.PDataset.divisionJoinMaxDivisions
    val minD = graft.core.PDataset.divisionJoinMinDivisions(session)
    if (nDiv < minD || maxD < minD) return None
    val g = math.min(nDiv, maxD)
    val merged: IndexedSeq[Option[Bound]] =
      if (g == nDiv) (None +: divisions.map(Some(_))) :+ None
      else (None +: (1 until g).map(jj =>
        Some(divisions((jj.toLong * nDiv / g).toInt - 1)))) :+ None

    def children(side: LogicalPlan, keys: Seq[Attribute]):
        (IndexedSeq[LogicalPlan], IndexedSeq[Seq[Attribute]]) = {
      val built = (0 until g).map { i =>
        val (sub, keysI) =
          if (i == 0) (side, keys)
          else {
            val (c, m) = freshCopy(side)
            (c, keys.map(a => m(a.exprId)))
          }
        (Filter(rangePred(keysI, merged(i), merged(i + 1)), sub), keysI)
      }
      (built.map(_._1), built.map(_._2))
    }
    val (lChildren, lChildKeys) = children(l, lKeys)
    val (rChildren, rChildKeys) = children(r, rKeys)
    DivisionJoin.ensureStrategy(session)
    val node = DivisionJoinPlan(Inner, keyNames.toIndexedSeq, g,
      (lChildKeys ++ rChildKeys).flatten, lChildren ++ rChildren)

    // Restore the ON-join output shape: the node emits keys ONCE
    // (division-0 left attrs — original ExprIds) plus both sides'
    // non-keys; the right key columns re-materialize from the left
    // keys (equal and non-null on every inner-matched row).
    val rKeyById: Map[ExprId, Int] =
      rKeys.map(_.exprId).zipWithIndex.toMap
    val nodeOut = node.outputSet
    val projectList: Seq[NamedExpression] = j.output.map { a =>
      rKeyById.get(a.exprId) match {
        case Some(i) =>
          Alias(lKeys(i), a.name)(exprId = a.exprId,
            qualifier = a.qualifier)
        case None =>
          if (!nodeOut.contains(a)) return None // defensive: bail out
          a
      }
    }
    val projected = Project(projectList, node)
    logInfo(s"graft: rewrote inner join on ${keyNames.mkString(",")} " +
      s"to a zero-Exchange division join ($g ranges)")
    Some(residual.reduceOption(And(_, _))
      .map(Filter(_, projected)).getOrElse(projected))
  }
}
