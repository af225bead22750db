package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Null-aware lexicographic range predicates as Catalyst `Column`
  * expressions.
  *
  * Builds the recursive OR-chain `lt(c0,b0) || (c0 === b0 && rest)` that
  * realizes a lexicographic tuple comparison against a constant bound,
  * where a NULL column value sorts below every non-null value (and a NULL
  * bound component means "minus infinity" for that position). Semantics
  * follow the reference engine's filter builders (padawan
  * `ordering.py:5-66`).
  *
  * Note the equality branch uses plain null-propagating equality (`===`),
  * NOT null-safe `<=>`: a row with a null at position k never matches the
  * `c === b` branch, exactly like the reference. These predicates stay
  * inside whole-stage codegen (plain comparisons + boolean ops) and are
  * pushed to the parquet scan by Catalyst where possible.
  */
object LexColumns {

  private def litOf(v: Any): Column = lit(v)

  /** col < v under null-first order (null col = -inf). */
  def nullLt(c: Column, v: Option[Any]): Column = v match {
    case None    => lit(false)
    case Some(x) => c.isNull || (c < litOf(x))
  }

  /** col <= v under null-first order. */
  def nullLeq(c: Column, v: Option[Any]): Column = v match {
    case None    => c.isNull
    case Some(x) => c.isNull || (c <= litOf(x))
  }

  /** col > v under null-first order. */
  def nullGt(c: Column, v: Option[Any]): Column = v match {
    case None    => !c.isNull
    case Some(x) => c > litOf(x)
  }

  /** col >= v under null-first order. */
  def nullGeq(c: Column, v: Option[Any]): Column = v match {
    case None    => lit(true)
    case Some(x) => c >= litOf(x)
  }

  private def eqBranch(c: Column, v: Option[Any]): Column = v match {
    // `c === lit(null)` is never true (null-propagating), matching the
    // reference's `pl.col(c) == None` behaviour in a filter context.
    case None    => lit(null).cast("boolean")
    case Some(x) => c === litOf(x)
  }

  private def recurse(
      cols: Seq[Column],
      bound: Seq[Option[Any]],
      leaf: (Column, Option[Any]) => Column,
      step: (Column, Option[Any]) => Column): Column = {
    require(cols.nonEmpty && cols.length == bound.length,
      s"columns (${cols.length}) and bound (${bound.length}) must be non-empty and equal length")
    if (cols.length == 1) leaf(cols.head, bound.head)
    else
      step(cols.head, bound.head) ||
        (eqBranch(cols.head, bound.head) &&
          recurse(cols.tail, bound.tail, leaf, step))
  }

  /** (c1,...,cn) < (b1,...,bn) lexicographically, null-first. */
  def columnsLt(cols: Seq[Column], bound: Seq[Option[Any]]): Column =
    recurse(cols, bound, nullLt, nullLt)

  /** (c1,...,cn) <= (b1,...,bn) lexicographically, null-first. */
  def columnsLeq(cols: Seq[Column], bound: Seq[Option[Any]]): Column =
    recurse(cols, bound, nullLeq, nullLt)

  /** (c1,...,cn) > (b1,...,bn) lexicographically, null-first. */
  def columnsGt(cols: Seq[Column], bound: Seq[Option[Any]]): Column =
    recurse(cols, bound, nullGt, nullGt)

  /** (c1,...,cn) >= (b1,...,bn) lexicographically, null-first. */
  def columnsGeq(cols: Seq[Column], bound: Seq[Option[Any]]): Column =
    recurse(cols, bound, nullGeq, nullGt)
}
