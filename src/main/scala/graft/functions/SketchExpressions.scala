package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd sketch kernels. The logical definitions live in
  * graft.operators.Dedup as higher-order-function expressions; these
  * expressions compute the identical values (same parameters, same
  * arithmetic, bit-for-bit) with a tight generated loop instead of k
  * nested interpreted lambdas — the difference between O(rows) and
  * O(rows x perms) interpreter dispatch.
  */

/** MinHash signature over a pre-hashed shingle array:
  * sig[i] = min over h of ((a_i * h + b_i) mod p). Empty input gives
  * an array of p (the identity of min under the modulus bound).
  */
case class MinHashSigExpr(
    child: Expression,
    numPerms: Int,
    seed: Long,
    prime: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val params: (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val as = Array.fill(numPerms)((rnd.nextInt(1 << 30) | 1).toLong)
    val bs = Array.fill(numPerms)(rnd.nextInt(Int.MaxValue).toLong)
    (as, bs)
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val (as, bs) = params
    val out = new Array[Long](numPerms)
    var i = 0
    while (i < numPerms) {
      var mn = Long.MaxValue
      var j = 0
      val n = hs.numElements()
      while (j < n) {
        val v = java.lang.Math.floorMod(as(i) * hs.getLong(j) + bs(i), prime)
        if (v < mn) mn = v
        j += 1
      }
      out(i) = if (n == 0) prime else mn
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (as, bs) = params
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mn = ctx.freshName("mn")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      s"""
        long[] $out = new long[$numPerms];
        int $n = $c.numElements();
        for (int $i = 0; $i < $numPerms; $i++) {
          long $mn = Long.MAX_VALUE;
          for (int $j = 0; $j < $n; $j++) {
            long $v = java.lang.Math.floorMod(
              $aRef[$i] * $c.getLong($j) + $bRef[$i], ${prime}L);
            if ($v < $mn) $mn = $v;
          }
          $out[$i] = ($n == 0) ? ${prime}L : $mn;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash from a token-hash array: bit i set iff more than
  * half the tokens have bit i set. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < 64) {
        counts(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      j += 1
    }
    var sim = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) * 2 > n) sim |= (1L << i)
      i += 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sim = ctx.freshName("sim")
      s"""
        int $n = $c.numElements();
        int[] $counts = new int[64];
        for (int $j = 0; $j < $n; $j++) {
          long $h = $c.getLong($j);
          for (int $i = 0; $i < 64; $i++) {
            $counts[$i] += (int) (($h >>> $i) & 1L);
          }
        }
        long $sim = 0L;
        for (int $i = 0; $i < 64; $i++) {
          if ($counts[$i] * 2 > $n) $sim |= (1L << $i);
        }
        ${ev.value} = $sim;
      """
    })

  override protected def withNewChildInternal(c: Expression): SimHash64Expr =
    copy(child = c)
  override def prettyName: String = "simhash64"
}

object SketchExpressions {
  def minhashSig(hashes: Column, numPerms: Int, seed: Long, prime: Long): Column =
    GraftBridge.toColumn(
      MinHashSigExpr(GraftBridge.toExpression(hashes), numPerms, seed, prime))

  def simhash64(hashes: Column): Column =
    GraftBridge.toColumn(SimHash64Expr(GraftBridge.toExpression(hashes)))
}
