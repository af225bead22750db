package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-canonical text for near-duplicate detection, as one
  * codegen'd pass.
  *
  * Exact-hash and MinHash dedup both live or die on canonicalization:
  * "Café  Noir!" and "cafe noir" are the same training document. This
  * expression applies the standard pre-pass in one Java kernel per
  * row:
  *
  *   1. Unicode NFC composition (é as e+combining-acute == é as one
  *      codepoint);
  *   2. lowercase (locale-independent, `Locale.ROOT`);
  *   3. accent stripping — NFD decomposition, then every combining
  *      mark (category M) dropped;
  *   4. every non-alphanumeric run (punctuation, symbols, whitespace,
  *      control) folds to a single ASCII space, leading/trailing runs
  *      dropped.
  *
  * Spark has no built-in Unicode normalization at all, and the regex
  * composition of steps 2+4 alone walks the string four times through
  * the regex engine; this is a single forward pass. On pure-ASCII
  * input the result is byte-identical to the ANSI-SQL form
  * `trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))`, which
  * is what the DuckDB oracle checks; the Unicode steps are pinned by
  * KernelSpec differentials (DuckDB's `strip_accents` agrees: marks
  * strip, standalone letters like 'ø' survive).
  */
case class CanonTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    CanonTextExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.CanonTextExpr.compute($c);"
    })

  override protected def withNewChildInternal(c: Expression): CanonTextExpr =
    copy(child = c)
  override def prettyName: String = "canon_text"
}

object CanonTextExpr {

  /** ASCII fast path: no codepoint above 0x7F means NFC, NFD and mark
    * stripping are all identity — skip the Normalizer allocations and
    * fold in one pass over the bytes. */
  def compute(input: UTF8String): UTF8String = {
    val bytes = input.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return UTF8String.fromBytes(foldAscii(bytes))
    UTF8String.fromString(canonUnicode(input.toString))
  }

  private def foldAscii(bytes: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](bytes.length)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < bytes.length) {
      var b = bytes(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      val alnum = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (alnum) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        out(o) = b
        o += 1
        pendingSpace = false
      } else pendingSpace = true
      i += 1
    }
    java.util.Arrays.copyOf(out, o)
  }

  private[functions] def canonUnicode(s: String): String = {
    import java.text.Normalizer
    // NFC first so lowercasing sees composed forms, then NFD to peel
    // the marks off; lowercase between the two (İ lowers to i +
    // combining dot — the NFD pass then strips the dot).
    val nfc = Normalizer.normalize(s, Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val nfd = Normalizer.normalize(lower, Normalizer.Form.NFD)
    val out = new java.lang.StringBuilder(nfd.length)
    var pendingSpace = false
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      val t = Character.getType(cp)
      val mark = t == Character.NON_SPACING_MARK ||
        t == Character.COMBINING_SPACING_MARK ||
        t == Character.ENCLOSING_MARK
      if (!mark) {
        if (Character.isLetterOrDigit(cp)) {
          if (pendingSpace && out.length > 0) out.append(' ')
          out.appendCodePoint(cp)
          pendingSpace = false
        } else pendingSpace = true
      }
      i += Character.charCount(cp)
    }
    out.toString
  }
}

object CanonText {
  /** Column form of [[CanonTextExpr]]. */
  def canonText(c: Column): Column =
    GraftBridge.toColumn(CanonTextExpr(GraftBridge.toExpression(c)))
}
