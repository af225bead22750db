package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Repetition-based quality signals (the Gopher / MassiveText
  * repetition filters, the most-used public quality gates after the
  * length/symbol ones): per document,
  *
  *   - `dup_line_frac`  — fraction of CHARACTERS sitting in lines
  *     whose exact text occurs more than once (char-weighted, so one
  *     repeated boilerplate banner dominates a short doc the way it
  *     should);
  *   - `top_ngram_frac` — occurrences of the most frequent word
  *     n-gram over total n-gram occurrences;
  *   - `dup_ngram_frac` — repeated-occurrence ratio: (total n-gram
  *     occurrences - distinct n-grams) / total occurrences.
  *
  * One kernel pass per row (one line split + one token split + two
  * hash maps), emitted as `array<double>` of the three fractions so a
  * projection extracts them without re-running the kernel
  * (CollapseProject keeps a non-cheap alias referenced more than once
  * in its own project).
  *
  * Exact-rederivation contract (the DuckDB oracle hash-matches):
  * lines are `split(text, '\n')` with code-point char weights;
  * n-grams use the clamped-slice construction of
  * [[WordShinglesExpr]] — tokens of `trim(lower(text))` on `\s+`,
  * `max(len - n + 1, 1)` positional grams, duplicates KEPT — and all
  * three fractions are quotients of exact integers, so IEEE division
  * gives bit-identical doubles in any engine.
  */
case class RepetitionStatsExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "ngram size must be >= 1")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      RepetitionStatsExpr.compute(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          graft.functions.RepetitionStatsExpr.compute($c, $n));
      """
    })

  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
  override def prettyName: String = "repetition_stats"
}

object RepetitionStatsExpr {
  private val Ws = Pattern.compile("\\s+")

  /** SQL-trim: strip leading/trailing SPACE characters only. */
  private def sqlTrim(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }

  def compute(input: UTF8String, n: Int): Array[Double] = {
    val raw = input.toString

    // ---- duplicate-line char fraction (exact lines of the RAW text)
    val lines = raw.split("\n", -1)
    val lineCount = new java.util.HashMap[String, Int](lines.length * 2)
    var i = 0
    while (i < lines.length) {
      lineCount.merge(lines(i), 1, Integer.sum _)
      i += 1
    }
    var chars = 0L
    var dupChars = 0L
    val it = lineCount.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val ln = e.getKey
      val w = ln.codePointCount(0, ln.length).toLong * e.getValue
      chars += w
      if (e.getValue > 1) dupChars += w
    }
    val dupLineFrac = dupChars.toDouble / math.max(chars, 1L).toDouble

    // ---- word n-gram repetition (clamped slices, duplicates kept)
    val toks = Ws.split(sqlTrim(raw.toLowerCase(java.util.Locale.ROOT)), -1)
    val total = math.max(toks.length - (n - 1), 1)
    val gramCount = new java.util.HashMap[String, Int](total * 2)
    i = 0
    while (i < total) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      gramCount.merge(sb.toString, 1, Integer.sum _)
      i += 1
    }
    var maxCnt = 0
    val git = gramCount.values().iterator()
    while (git.hasNext) maxCnt = math.max(maxCnt, git.next())
    val topNgramFrac = maxCnt.toDouble / total.toDouble
    val dupNgramFrac = (total - gramCount.size).toDouble / total.toDouble

    Array(dupLineFrac, topNgramFrac, dupNgramFrac)
  }
}

object RepetitionExpressions {
  /** `array(dup_line_frac, top_ngram_frac, dup_ngram_frac)` — see
    * [[RepetitionStatsExpr]]. */
  def repetitionStats(c: Column, n: Int): Column =
    GraftBridge.toColumn(RepetitionStatsExpr(GraftBridge.toExpression(c), n))
}
