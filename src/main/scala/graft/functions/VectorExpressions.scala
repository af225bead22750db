package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DecimalType, DoubleType, FloatType, IntegerType, LongType, NumericType, ShortType}

/** Native vector arithmetic over `array<float>` / `array<double>`
  * embedding columns.
  *
  * The built-in route (`zip_with` + `aggregate`) allocates an
  * intermediate array per row and evaluates its lambdas interpreted —
  * fatal when a similarity join applies it to millions of candidate
  * pairs. This expression generates a tight primitive loop inside
  * whole-stage codegen instead: no allocation, no virtual calls, pure
  * double accumulation (ascending index order, so results are
  * bit-identical to the sequential higher-order-function fold and to
  * any engine summing left-to-right).
  *
  * Null elements inside a vector are treated as 0; a null vector gives
  * a null result (standard null-intolerant binary expression).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs numeric arrays, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lt = elemType(left)
    val rt = elemType(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else numAt(x, i, lt)
      val yv = if (y.isNullAt(i)) 0.0 else numAt(y, i, rt)
      sum += xv * yv
      i += 1
    }
    sum
  }

  private def numAt(a: ArrayData, i: Int, t: NumericType): Double = t match {
    case FloatType      => a.getFloat(i).toDouble
    case DoubleType     => a.getDouble(i)
    case IntegerType    => a.getInt(i).toDouble
    case LongType       => a.getLong(i).toDouble
    case ShortType      => a.getShort(i).toDouble
    case ByteType       => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = genGet(elemType(left))
    val rGet = genGet(elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $sum = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double xv = $a.isNullAt($i) ? 0.0 : (double) $a.${lGet("" + i)};
          double yv = $b.isNullAt($i) ? 0.0 : (double) $b.${rGet("" + i)};
          $sum += xv * yv;
        }
        ${ev.value} = $sum;
      """
    })
  }

  /** Typed ArrayData accessor (the primitive getters widen under the
    * template's `(double)` cast; Decimal converts explicitly) — covers
    * every NumericType admitted by checkInputDataTypes, so the
    * generated Java always compiles. */
  private def genGet(t: NumericType): String => String = t match {
    case FloatType      => i => s"getFloat($i)"
    case DoubleType     => i => s"getDouble($i)"
    case IntegerType    => i => s"getInt($i)"
    case LongType       => i => s"getLong($i)"
    case ShortType      => i => s"getShort($i)"
    case ByteType       => i => s"getByte($i)"
    case d: DecimalType =>
      i => s"getDecimal($i, ${d.precision}, ${d.scale})" +
        ".toJavaBigDecimal().doubleValue()"
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VectorExpressions {
  /** Dot product of two numeric-array columns (codegen, double acc). */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.toColumn(FloatVecDot(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** L2 norm via the same codegen'd loop. */
  def vecNorm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vecDot(a, a))
}
