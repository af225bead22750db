package graft.plans

import org.apache.spark.sql.{GraftFileIndex, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Cast, EqualNullSafe, Expression, ExprId, GreaterThan, GreaterThanOrEqual, IsNull, LeafExpression, LessThan, Literal, NamedExpression, Not, Or, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DataType

import graft.core.Lex
import graft.core.Lex.Bound

/** A division-range boundary value in a branch predicate. Evaluates
  * exactly like a non-null [[Literal]], but codegens through the
  * plan's REFERENCES array instead of inlining the value into the
  * generated source: every division branch of a rewrite then
  * generates byte-identical source (the bounds differ only in the
  * referenced objects), so `CodeGenerator`'s source-keyed compile
  * cache JIT-compiles ONE unit for the whole g-branch Union instead
  * of g — the ~90 ms/branch serial driver cost that used to cap the
  * division count at 256 becomes a one-off (see
  * `examples/DivisionSqlBench`). `foldable = false` keeps constant
  * folding from re-inlining it. `value` is a Catalyst INTERNAL value
  * of `dataType`, pre-cast at rule time. */
private[plans] case class DivisionBoundValue(value: Any, dataType: DataType)
    extends LeafExpression {
  require(value != null,
    "null bounds are encoded structurally (IsNull branches), never here")
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = value
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val javaType = CodeGenerator.javaType(dataType)
    val boxed = CodeGenerator.boxedType(dataType)
    val ref = ctx.addReferenceObj("divisionBound", value, boxed)
    ev.copy(code = code"final $javaType ${ev.value} = $ref;",
      isNull = FalseLiteral)
  }
  override def toString: String = s"divbound($value)"
}

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

  /** Bound value as a codegen REFERENCE (not an inlined literal) so
    * all branches share one generated source — see
    * [[DivisionBoundValue]]. The cast to the column's type runs HERE,
    * once, driver-side (the analyzer's coercion won't run over a
    * post-analysis plan). File pruning no longer depends on these
    * being pushable literals: each branch reads a pre-restricted
    * relation ([[GraftFileIndex.restrictTo]]). */
  private def litFor(a: Attribute, v: Any): Expression = {
    val l = Literal(v)
    val internal =
      if (l.dataType == a.dataType) l.value
      else Cast(l, a.dataType,
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
        .eval(null)
    if (internal == null) Literal(null, a.dataType) // uncastable: never matches
    else DivisionBoundValue(internal, a.dataType)
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
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.sql.divisionMinBytes",
        (1L << 30).toString).toLong

  /** One contiguous range slice of the rewrite: `[lo, hi)` with
    * unbounded-sentinel sides, plus the positions of the files whose
    * bound interval overlaps it (the branch's pre-pruned relation). */
  protected final case class Slice(
      lo: Option[Bound], hi: Option[Bound], files: IndexedSeq[Int])

  /** Merged division edges over one or two relations' `k`-prefix
    * bounds, at most `maxD` ranges, BYTE-weighted: cut points are
    * byte-quantiles of the per-division sidecar sizes, so no merged
    * slice concentrates a disproportionate share of the table(s) in
    * its one task (a count-weighted merge puts half the bytes in one
    * slice whenever file sizes skew). Returns None when there are
    * fewer natural divisions than `minD` (under-utilizes the cluster
    * vs the full-parallelism Exchange plan) or `maxD < minD` (cap
    * used to disable the rewrites). Edges tile with unbounded
    * sentinels: `g+1` entries for `g` slices. */
  protected def mergedEdgesWeighted(
      idxs: Seq[GraftFileIndex], k: Int, maxD: Int, minD: Int)
      : Option[IndexedSeq[Option[Bound]]] = {
    val lbs = idxs.flatMap(_.lexLowerBounds).map(_.take(k)).toIndexedSeq
    val sizes = idxs.flatMap(_.fileSizes).toIndexedSeq
    val bounds = lbs.distinct.sorted(Lex.boundOrdering)
    val nDiv = bounds.length + 1
    if (nDiv < minD || maxD < minD) return None
    val g = math.min(nDiv, maxD)
    if (g == nDiv) return Some((None +: bounds.map(Some(_))) :+ None)
    // per-division bytes (division d spans [edge_d, edge_{d+1}); a
    // file starts in the division right after its lb's bound)
    val posOf = bounds.zipWithIndex.toMap
    val divBytes = new Array[Long](nDiv)
    lbs.indices.foreach { f => divBytes(posOf(lbs(f)) + 1) += sizes(f) }
    // Greedy fair-share walk: close a slice once it reaches its share
    // of the REMAINING bytes (recomputed per slice, so rounding never
    // swallows a slice the way global byte-quantiles do under
    // near-equal sizes), or when the remaining divisions are only
    // just enough to give each remaining slice one. Exactly g slices
    // whenever g non-empty divisions exist.
    val total = math.max(1L, divBytes.sum)
    val cuts = IndexedSeq.newBuilder[Int]
    var acc = 0L
    var remainingBytes = total
    var slicesLeft = g
    var d = 0
    while (d < nDiv - 1 && slicesLeft > 1) {
      acc += divBytes(d)
      val divisionsLeft = nDiv - d - 1
      if ((acc > 0 && acc.toDouble >= remainingBytes.toDouble / slicesLeft)
          || divisionsLeft < slicesLeft) {
        cuts += d // cut after division d: edge = bounds(d)
        remainingBytes -= acc
        acc = 0L
        slicesLeft -= 1
      }
      d += 1
    }
    Some((None +: cuts.result().map(i => Some(bounds(i)))) :+ None)
  }

  /** Per-slice file positions of `idx` for `edges`: slice i keeps the
    * files whose `[lb, ub]` prefix interval overlaps `[e_i, e_{i+1})`
    * (possibly empty — join sides keep empty slices so the two sides
    * stay positionally aligned). Two pointers over files sorted by
    * lb; `start` drops the window prefix that can never match again
    * (slice lows only grow). */
  protected def sliceFiles(
      idx: GraftFileIndex, k: Int,
      edges: IndexedSeq[Option[Bound]]): IndexedSeq[IndexedSeq[Int]] = {
    val lbs = idx.lexLowerBounds.map(_.take(k))
    val ubs = idx.lexUpperBounds.map(_.take(k))
    val order = lbs.indices.sortBy(lbs)(Lex.boundOrdering)
    val out = IndexedSeq.newBuilder[IndexedSeq[Int]]
    var start = 0
    var end = 0
    (0 until edges.length - 1).foreach { i =>
      val lo = edges(i)
      val hi = edges(i + 1)
      end = hi match {
        case None => order.length
        case Some(h) =>
          var e = end
          while (e < order.length && Lex.lexCmp(lbs(order(e)), h) < 0) e += 1
          e
      }
      out += (start until end).collect {
        case j if lo.forall(l => Lex.lexCmp(ubs(order(j)), l) >= 0) =>
          order(j)
      }.sorted
      // the NEXT slice's lo is this slice's hi: drop the window
      // prefix that can never reach it again
      hi.foreach { nextLo =>
        while (start < end &&
            Lex.lexCmp(ubs(order(start)), nextLo) < 0) start += 1
      }
    }
    out.result()
  }

  /** [[mergedEdgesWeighted]] + [[sliceFiles]] for the single-relation
    * rules (agg/window/sort), with EMPTY slices dropped — a range no
    * file overlaps holds no rows, so its branch would scan nothing. */
  protected def divisionSlices(
      idx: GraftFileIndex, k: Int, maxD: Int, minD: Int)
      : Option[IndexedSeq[Slice]] = {
    val edges = mergedEdgesWeighted(Seq(idx), k, maxD, minD)
      .getOrElse(return None)
    val files = sliceFiles(idx, k, edges)
    val slices = files.indices.collect {
      case i if files(i).nonEmpty => Slice(edges(i), edges(i + 1), files(i))
    }
    if (slices.isEmpty) None else Some(slices)
  }

  /** The branch chain for a slice: the Project/Filter/relation chain
    * with the leaf relation RESTRICTED to the slice's files (pruning
    * by construction — branch range bounds are codegen references,
    * invisible to filter pushdown, so the relation itself must carry
    * the file subset). Branch 0 (`first`) keeps the original output
    * ExprIds (the Union's output, which parent operators reference);
    * later branches are fresh copies. */
  protected def sliceChain(
      chain: LogicalPlan,
      idx: GraftFileIndex,
      files: IndexedSeq[Int],
      first: Boolean): (LogicalPlan, Map[ExprId, Attribute]) = {
    val sub = idx.restrictTo(files)
    def swapRelation(p: LogicalPlan): LogicalPlan = p match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          lr.copy(relation = fs.copy(location = sub)(session))
        case _ => lr
      }
      case f: Filter => f.copy(child = swapRelation(f.child))
      case pr: Project => pr.copy(child = swapRelation(pr.child))
      case other => other
    }
    if (first) (swapRelation(chain), Map.empty)
    else {
      val (copy, m) = freshCopy(chain)
      (swapRelation(copy), m)
    }
  }
}
