package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as a single custom expression.
  *
  * Semantically identical to the composable form
  * `array_distinct(transform(seq, i => concat_ws(" ", slice(tokens, i, n))))`
  * with `tokens = split(trim(lower(text)), "\s+")` — but that tree
  * evaluates interpreted higher-order lambdas with per-element
  * projection machinery (~0.8 ms/row measured); this expression is one
  * Java loop per row. Matches the DuckDB oracle construction
  * (`list_slice` clamps at the end; trim strips spaces only, like both
  * engines' SQL `trim`).
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WordShinglesExpr.compute(input.asInstanceOf[UTF8String], n)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          (Object[]) graft.functions.WordShinglesExpr.compute($c, $n));
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): WordShinglesExpr =
    copy(child = c)
  override def prettyName: String = "word_shingles"
}

object WordShinglesExpr {
  private val Ws = Pattern.compile("\\s+")

  /** SQL-trim: strip leading/trailing SPACE characters only. */
  private def sqlTrim(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }

  def compute(input: UTF8String, n: Int): Array[UTF8String] = {
    val text = sqlTrim(input.toString.toLowerCase(java.util.Locale.ROOT))
    val toks = Ws.split(text, -1)
    val count = math.max(toks.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[UTF8String](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = UTF8String.fromString(it.next())
      k += 1
    }
    out
  }
}

object ShingleExpressions {
  def wordShingles(c: Column, n: Int): Column =
    GraftBridge.toColumn(WordShinglesExpr(GraftBridge.toExpression(c), n))
}
