package graft.core

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, IntegerType}

import Lex.Bound

/** O(log d) per-row division routing: binary search over the sorted
  * division lower bounds, replacing the O(d) `when`-chain that the
  * one-shuffle scatter write used to tag rows with their target
  * partition (reference semantics: `repartitioned_dataset.py:14-25` —
  * a row's partition is the FIRST division bound it is lex-less-than,
  * else the last partition).
  *
  * The comparison replicates [[LexColumns.columnsLt]]'s three-valued
  * logic exactly (verified by a differential spec against the
  * `when`-chain):
  *   - a NULL bound component reached after a tie prefix makes the
  *     whole predicate non-true (`c === lit(null)` is null, and
  *     `nullLt(c, None)` is false) — so `lt = false`;
  *   - a NULL row value against a non-null bound component is less
  *     (null-first order) — `lt = true`;
  *   - otherwise the column type's ordering decides, recursing on ties.
  *
  * Binary search is sound because this predicate is monotone over
  * lex-sorted bounds: once a row is less than some bound it is less
  * than every later one (bounds with a NULL at the deciding position
  * sort before bounds with a value there, and both the dead-false and
  * the true branches respect that order).
  *
  * The bounds array rides along as one broadcast-with-the-task
  * reference object — plan size is O(1) in the number of divisions,
  * eval is O(log d) comparisons, and the expression stays inside
  * whole-stage codegen (the generated code evaluates the index columns
  * inline and calls [[DivisionRouter.route]]).
  */
case class DivisionRouterExpr(
    children: Seq[Expression],
    bounds: Seq[Bound]) extends Expression {

  require(children.nonEmpty && bounds.nonEmpty &&
    bounds.forall(_.length == children.length),
    "division bounds must be non-empty and match the index column count")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  @transient private lazy val router: DivisionRouter =
    DivisionRouter.build(children.map(_.dataType), bounds)

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val vals = new Array[Any](n)
    var i = 0
    while (i < n) { vals(i) = children(i).eval(input); i += 1 }
    router.route(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val routerRef =
      ctx.addReferenceObj("divisionRouter", router, classOf[DivisionRouter].getName)
    val vals = ctx.freshName("routeVals")
    val childCodes = children.map(_.genCode(ctx))
    val fill = children.zipWithIndex.map { case (ch, i) =>
      val c = childCodes(i)
      val jt = CodeGenerator.javaType(ch.dataType)
      val boxed =
        if (CodeGenerator.isPrimitiveType(jt))
          s"${CodeGenerator.boxedType(ch.dataType)}.valueOf(${c.value})"
        else s"${c.value}"
      s"""
        ${c.code}
        $vals[$i] = ${c.isNull} ? null : (Object) $boxed;
      """
    }.mkString("\n")
    ev.copy(
      code = code"""
        Object[] $vals = new Object[${children.length}];
        $fill
        int ${ev.value} = $routerRef.route($vals);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DivisionRouterExpr =
    copy(children = newChildren)

  override def prettyName: String = "division_route"
}

/** Task-serializable binary-search kernel: bounds in Catalyst internal
  * form (null = the reference's None component), one interpreted
  * ordering per index column (rebuilt per executor — orderings are not
  * serialized).
  */
final class DivisionRouter(
    private val bounds: Array[Array[Any]],
    private val types: Array[DataType]) extends Serializable {

  @transient private lazy val orderings: Array[Ordering[Any]] =
    types.map(TypeUtils.getInterpretedOrdering)

  /** First bound index the row is lex-less-than, else bounds.length. */
  def route(vals: Array[Any]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ltBound(vals, bounds(mid))) hi = mid else lo = mid + 1
    }
    lo
  }

  /** `columnsLt` three-valued logic collapsed to its when-clause
    * boolean: null bound component → false, null row value → true,
    * else ordering with recursion on ties. */
  private def ltBound(row: Array[Any], b: Array[Any]): Boolean = {
    var k = 0
    while (k < row.length) {
      val bv = b(k)
      if (bv == null) return false
      val rv = row(k)
      if (rv == null) return true
      val c = orderings(k).compare(rv, bv)
      if (c < 0) return true
      if (c > 0) return false
      k += 1
    }
    false
  }
}

object DivisionRouter {

  /** Convert driver-side external bound values to Catalyst internal
    * form for the given column types. Values come from the same columns
    * the stats were collected on, so `Literal(v)` almost always infers
    * the exact column type; a mismatched (but lossless) value is routed
    * through a legacy Cast the way the analyzer would coerce the
    * `when`-chain's literals. */
  def build(types: Seq[DataType], bounds: Seq[Bound]): DivisionRouter = {
    val ts = types.toArray
    val internal = bounds.map { b =>
      b.zipWithIndex.map {
        case (None, _) => null
        case (Some(v), i) =>
          val l = Literal(v)
          if (l.dataType == ts(i)) l.value
          else Cast(l, ts(i), Some(java.util.TimeZone.getDefault.getID),
            EvalMode.LEGACY).eval(InternalRow.empty)
      }.toArray[Any]
    }.toArray
    new DivisionRouter(internal, ts)
  }

  /** Column API: route each row to its division partition. */
  def route(cols: Seq[Column], bounds: Seq[Bound]): Column =
    GraftBridge.toColumn(
      DivisionRouterExpr(cols.map(GraftBridge.toExpression), bounds))
}
