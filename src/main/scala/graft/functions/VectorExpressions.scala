package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** The `nprobe` nearest centroid indices of a float/double vector by
  * squared L2 distance (ascending; ties by lower index) — the IVF
  * assignment/probe kernel. One generated loop over
  * nlist x dim + selection over nlist, instead of nlist composed
  * distance expression trees.
  *
  * Null elements count as 0; shorter vectors compare on the common
  * prefix with the centroid's tail contributing its own squared mass
  * (i.e. missing vector components are 0).
  */
case class NearestCentroidsExpr(
    child: Expression,
    centroids: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {

  require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length,
    "need 1 <= nprobe <= number of centroids")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroids needs array<float|double>, got $other")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Selection of the nprobe smallest distances: repeated argmin with
    * used-marking — O(nlist * nprobe), branch-free enough for small
    * nlist (IVF lists are tens to thousands). */
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val fl = isFloat
    val nlist = centroids.length
    val dist = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val ct = centroids(c)
      var acc = 0.0
      var i = 0
      while (i < ct.length) {
        val xv =
          if (i >= n || v.isNullAt(i)) 0.0
          else if (fl) v.getFloat(i).toDouble else v.getDouble(i)
        val d = xv - ct(i)
        acc += d * d
        i += 1
      }
      dist(c) = acc
      c += 1
    }
    val out = new Array[Int](nprobe)
    val used = new Array[Boolean](nlist)
    var p = 0
    while (p < nprobe) {
      var best = -1
      var bd = Double.PositiveInfinity
      var j = 0
      while (j < nlist) {
        if (!used(j) && (best < 0 || dist(j) < bd)) { bd = dist(j); best = j }
        j += 1
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    val nlist = centroids.length
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val dist = ctx.freshName("dist")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val ct = ctx.freshName("ct")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      s"""
        int $n = $in.numElements();
        double[] $dist = new double[$nlist];
        for (int $c = 0; $c < $nlist; $c++) {
          double[] $ct = $cRef[$c];
          double $acc = 0.0;
          for (int $i = 0; $i < $ct.length; $i++) {
            double xv = ($i >= $n || $in.isNullAt($i))
              ? 0.0 : (double) $in.$get($i);
            double d = xv - $ct[$i];
            $acc += d * d;
          }
          $dist[$c] = $acc;
        }
        int[] $out = new int[$nprobe];
        boolean[] $used = new boolean[$nlist];
        for (int $p = 0; $p < $nprobe; $p++) {
          int $best = -1;
          double $bd = Double.POSITIVE_INFINITY;
          for (int $j = 0; $j < $nlist; $j++) {
            if (!$used[$j] && ($best < 0 || $dist[$j] < $bd)) {
              $bd = $dist[$j]; $best = $j;
            }
          }
          $used[$best] = true;
          $out[$p] = $best;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroidsExpr =
    copy(child = c)
  override def prettyName: String = "nearest_centroids"
}

/** Asymmetric-distance computation for product quantization: the
  * squared L2 distance between a raw query vector and a PQ-encoded
  * corpus vector, via its per-subspace centroid codes —
  * sum_s ||q[s*d..(s+1)*d) - codebook[s][code_s]||^2. One codebook
  * lookup + d subtractions per subspace instead of touching the full
  * corpus vector: the reason a PQ index scans 8-byte codes, not
  * 256-byte floats, at 100 TB.
  *
  * Null elements count as 0; out-of-range codes throw (an encoding
  * bug, not a data condition).
  */
case class PqAdcExpr(
    left: Expression,   // query vector: array<float|double>
    right: Expression,  // codes: array<int>, length m
    codebooks: Array[Array[Array[Double]]]) extends BinaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "need m non-empty codebooks")

  private def m: Int = codebooks.length
  private def dsub: Int = codebooks(0)(0).length

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc needs (array<float|double>, array<int>), got $other")
    }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(q: Any, c: Any): Any =
    adc(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  /** Shared by eval and the generated code (house pattern: one
    * reference-object call, loop stays in JVM-compiled scala). */
  def adc(q: ArrayData, codes: ArrayData): Double = {
    val fl = isFloat
    val n = q.numElements()
    var acc = 0.0
    var s = 0
    val mm = math.min(m, codes.numElements())
    while (s < mm) {
      val book = codebooks(s)
      val code = codes.getInt(s)
      val ct = book(code)
      var j = 0
      while (j < dsub) {
        val i = s * dsub + j
        val qv =
          if (i >= n || q.isNullAt(i)) 0.0
          else if (fl) q.getFloat(i).toDouble else q.getDouble(i)
        val d = qv - ct(j)
        acc += d * d
        j += 1
      }
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcExpr].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => s"${ev.value} = $ref.adc($q, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc"
}

/** PQ encoding in ONE pass: every subspace's nearest-centroid code for
  * a vector, as array<int> of length m. The composed alternative —
  * m `slice` + `nearest_centroids` expression pairs — allocates m
  * subarrays per row and re-enters codegen m times; this kernel reads
  * each vector element exactly once. */
case class PqEncodeExpr(
    child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "need m non-empty codebooks")

  private def m: Int = codebooks.length
  private def dsub: Int = codebooks(0)(0).length

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode needs array<float|double>, got $other")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  /** Shared by eval and the generated code. Ties break to the lowest
    * centroid index (matching NearestCentroidsExpr); missing vector
    * components are 0. */
  def encode(v: ArrayData): ArrayData = {
    val fl = isFloat
    val n = v.numElements()
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      var best = 0
      var bd = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val ct = book(c)
        var acc = 0.0
        var j = 0
        while (j < dsub) {
          val i = s * dsub + j
          val xv =
            if (i >= n || v.isNullAt(i)) 0.0
            else if (fl) v.getFloat(i).toDouble else v.getDouble(i)
          val d = xv - ct(j)
          acc += d * d
          j += 1
        }
        if (acc < bd) { bd = acc; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncoder", this, classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.encode($v);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

object VectorExpressions {
  /** Squared-L2 ADC distance of a raw query vector against PQ codes. */
  def pqAdc(query: Column, codes: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    GraftBridge.toColumn(PqAdcExpr(
      GraftBridge.toExpression(query), GraftBridge.toExpression(codes),
      codebooks))

  /** All m per-subspace PQ codes of a vector in one kernel pass. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftBridge.toColumn(PqEncodeExpr(
      GraftBridge.toExpression(vec), codebooks))
  /** Top-nprobe nearest centroid indices (squared L2, ascending). */
  def nearestCentroids(
      vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    GraftBridge.toColumn(NearestCentroidsExpr(
      GraftBridge.toExpression(vec), centroids, nprobe))

  /** Dot product of two numeric-array columns (codegen, double acc). */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.toColumn(FloatVecDot(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** L2 norm via the same codegen'd loop. */
  def vecNorm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vecDot(a, a))
}
