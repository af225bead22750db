package graft.core

/** Driver-side null-first lexicographic ordering over partition-bound
  * tuples.
  *
  * A bound is the value of the index-column tuple at a partition edge,
  * compared lexicographically with nulls ordering FIRST (null = minimum).
  * Mirrors the semantics of the reference engine's comparison helpers
  * (padawan `ordering.py:69-95`: `nullable_cmp`, `lex_cmp`, `lex_key`,
  * `sort_partitions`), re-expressed for JVM runtime values as produced by
  * Spark's external row format (Long/Int/Double/String/Boolean,
  * java.sql.Timestamp, java.sql.Date, java.time.Duration, ...).
  */
object Lex {

  /** One bound = one Option value per index column; None encodes SQL NULL. */
  type Bound = IndexedSeq[Option[Any]]

  val emptyBound: Bound = Vector.empty

  /** Compare two nullable scalars with null first (null < any value). */
  def nullableCmp(a: Option[Any], b: Option[Any]): Int = (a, b) match {
    case (None, None)       => 0
    case (None, _)          => -1
    case (_, None)          => 1
    case (Some(x), Some(y)) => valueCmp(x, y)
  }

  /** Compare two non-null scalars of the same SQL type. */
  def valueCmp(x: Any, y: Any): Int = (x, y) match {
    // Decimals compare EXACTLY (compareTo), never through doubleValue:
    // a >15-significant-digit DecimalType bound rounds under double
    // comparison, which would make driver-side pruning disagree with
    // the engine evaluating the very filters those bounds prune for.
    case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
      a.compareTo(b)
    case (a: java.math.BigDecimal, b: java.lang.Number) if isIntegral(b) =>
      a.compareTo(java.math.BigDecimal.valueOf(b.longValue()))
    case (a: java.lang.Number, b: java.math.BigDecimal) if isIntegral(a) =>
      java.math.BigDecimal.valueOf(a.longValue()).compareTo(b)
    // Numeric widening: index values may surface as different JVM numeric
    // classes after casts; compare numerically when both are numbers.
    case (a: java.lang.Number, b: java.lang.Number)
        if isIntegral(a) && isIntegral(b) =>
      java.lang.Long.compare(a.longValue(), b.longValue())
    case (a: java.lang.Number, b: java.lang.Number) =>
      java.lang.Double.compare(a.doubleValue(), b.doubleValue())
    // Strings compare in CODE POINT order (== UTF-8 byte order), the
    // order Spark's binary-collation comparisons and the reference's
    // polars byte comparisons use. Plain String.compareTo (UTF-16 code
    // units) would sort supplementary-plane characters BELOW
    // U+E000..U+FFFF, making driver-side bounds disagree with the
    // engine evaluating the very filters those bounds prune for.
    case (a: String, b: String) => codePointCmp(a, b)
    case (a: Comparable[_], b) =>
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    case _ =>
      throw new IllegalArgumentException(
        s"Cannot compare bound values of type ${x.getClass} and ${y.getClass}")
  }

  /** UTF-16 chars reordered to code-point order: BMP below surrogates.
    * [0, D7FF] stays; [E000, FFFF] -> [D800, F7FF]; surrogates
    * [D800, DFFF] -> [F800, FFFF] (a surrogate means a code point
    * >= U+10000, which must sort above every BMP character). */
  private def cpKey(c: Char): Int =
    if (c < 0xD800) c
    else if (c >= 0xE000) c - 0x800
    else c + 0x2000

  private def codePointCmp(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i)
      val cb = b.charAt(i)
      if (ca != cb) return Integer.compare(cpKey(ca), cpKey(cb))
      i += 1
    }
    Integer.compare(a.length, b.length)
  }

  private def isIntegral(n: java.lang.Number): Boolean = n match {
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
        _: java.lang.Byte =>
      true
    case _ => false
  }

  /** Lexicographic comparison of two equal-length bound tuples. */
  def lexCmp(a: Seq[Option[Any]], b: Seq[Option[Any]]): Int = {
    require(a.length == b.length,
      s"Cannot compare tuples with different lengths (${a.length} vs ${b.length}).")
    var i = 0
    while (i < a.length) {
      val c = nullableCmp(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  implicit val boundOrdering: Ordering[Bound] =
    (a: Bound, b: Bound) => lexCmp(a, b)

  def lexMin(a: Bound, b: Bound): Bound = if (lexCmp(a, b) <= 0) a else b
  def lexMax(a: Bound, b: Bound): Bound = if (lexCmp(a, b) >= 0) a else b

  /** Argsort partition indices by (lowerBound, upperBound). */
  def sortPartitions(lowerBounds: IndexedSeq[Bound],
                     upperBounds: IndexedSeq[Bound]): IndexedSeq[Int] = {
    require(lowerBounds.length == upperBounds.length,
      "lower_bounds and upper_bounds must have same length")
    lowerBounds.indices.sortBy(i => (lowerBounds(i), upperBounds(i)))(
      Ordering.Tuple2(boundOrdering, boundOrdering))
  }
}
