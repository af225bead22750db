package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Lex, PDataset, TypedJson}
import Fixtures._

/** M0 kernel: ordering, typed JSON codec, row-division arithmetic. */
class KernelSpec extends AnyFunSuite {

  test("nullableCmp: null first") {
    assert(Lex.nullableCmp(None, None) == 0)
    assert(Lex.nullableCmp(None, Some(1L)) < 0)
    assert(Lex.nullableCmp(Some(1L), None) > 0)
    assert(Lex.nullableCmp(Some(1L), Some(2L)) < 0)
    assert(Lex.nullableCmp(Some(2L), Some(2L)) == 0)
    assert(Lex.nullableCmp(Some("b"), Some("a")) > 0)
    assert(Lex.nullableCmp(Some(hrs(1)), Some(hrs(2))) < 0)
    assert(Lex.nullableCmp(Some(dt("2022-01-01")), Some(dt("2022-01-02"))) < 0)
    // cross-width integers compare numerically
    assert(Lex.nullableCmp(Some(2), Some(10L)) < 0)
  }

  test("lexCmp: lexicographic with null-first components") {
    assert(Lex.lexCmp(b(1L, 2L), b(1L, 3L)) < 0)
    assert(Lex.lexCmp(b(1L, 2L), b(1L, 2L)) == 0)
    assert(Lex.lexCmp(b(2L, 0L), b(1L, 9L)) > 0)
    assert(Lex.lexCmp(Vector(None, Some(5L)), b(0L, 0L)) < 0)
    assert(Lex.lexCmp(b(0L, 0L), Vector(Some(0L), None)) > 0)
    assert(Lex.lexCmp(Vector.empty, Vector.empty) == 0)
    intercept[IllegalArgumentException](Lex.lexCmp(b(1L), b(1L, 2L)))
  }

  test("string bounds compare in code-point (UTF-8 byte) order") {
    // U+FFFD is a BMP char; U+1F600 (surrogate pair) is a higher code
    // point. Java String.compareTo would order them the other way
    // (high surrogate 0xD83D < 0xFFFD), disagreeing with the order
    // Spark evaluates string predicates in.
    assert("�".compareTo("😀") > 0) // the UTF-16 trap
    assert(Lex.valueCmp("�", "😀") < 0)
    assert(Lex.valueCmp("😀", "�") > 0)
    assert(Lex.valueCmp("a", "b") < 0)
    assert(Lex.valueCmp("ab", "a") > 0)
    assert(Lex.valueCmp("a", "a") == 0)
  }

  test("sortPartitions orders by (lb, ub)") {
    val lbs = Vector(b(3L), b(1L), Vector(None: Option[Any]), b(1L))
    val ubs = Vector(b(4L), b(2L), b(0L), b(1L))
    assert(Lex.sortPartitions(lbs, ubs) == Vector(2, 3, 1, 0))
  }

  test("typed JSON round-trips temporal values") {
    val meta = Map(
      "ts" -> ts("2022-01-01T23:00:00"),
      "d" -> dt("2022-03-05"),
      "dur" -> hrs(26),
      "neg" -> java.time.Duration.ofHours(-1),
      "n" -> null,
      "xs" -> Seq(1L, 2.5, "s", true))
    val text = TypedJson.write(meta)
    val back = TypedJson.parse(text).asInstanceOf[Map[String, Any]]
    assert(back("ts") == ts("2022-01-01T23:00:00"))
    assert(back("d") == dt("2022-03-05"))
    assert(back("dur") == hrs(26))
    assert(back("neg") == java.time.Duration.ofHours(-1))
    assert(back("n") == null)
    assert(back("xs") == Vector(1L, 2.5, "s", true))
    // python-style timedelta normalization: -1h = -1 day + 82800 s
    assert(text.contains("-1d82800s0u"))
  }

  test("typed JSON keeps non-finite doubles and decimals exact") {
    // bare NaN/Infinity tokens are not JSON; the $float wrapper keeps
    // the document parseable for every later sidecar reader
    val nf = Map("nan" -> Double.NaN, "inf" -> Double.PositiveInfinity,
      "ninf" -> Double.NegativeInfinity, "f" -> Float.NaN)
    val back = TypedJson.parse(TypedJson.write(nf))
      .asInstanceOf[Map[String, Any]]
    assert(back("nan").asInstanceOf[Double].isNaN)
    assert(back("inf") == Double.PositiveInfinity)
    assert(back("ninf") == Double.NegativeInfinity)
    assert(back("f").asInstanceOf[Double].isNaN)
    // >15-significant-digit decimals shift under a Double round-trip;
    // the $decimal wrapper round-trips the plain string exactly
    val big = new java.math.BigDecimal("98765432109876543210.123456789")
    val dec = TypedJson.parse(TypedJson.write(Map("d" -> big)))
      .asInstanceOf[Map[String, Any]]
    assert(dec("d").asInstanceOf[java.math.BigDecimal]
      .compareTo(big) == 0)
    // and driver-side bound comparison is compareTo, not doubleValue:
    // these two differ only past double precision
    val a = new java.math.BigDecimal("98765432109876543210")
    val b2 = new java.math.BigDecimal("98765432109876543211")
    assert(a.doubleValue() == b2.doubleValue()) // double can't tell
    assert(Lex.valueCmp(a, b2) < 0 && Lex.valueCmp(b2, a) > 0)
    assert(Lex.valueCmp(a, java.lang.Long.valueOf(5L)) > 0)
    assert(Lex.valueCmp(java.lang.Long.valueOf(5L), a) < 0)
  }

  test("typed JSON accepts python-isoformat datetimes") {
    val v = TypedJson.parse("""{"$datetime": "2022-01-01T23:00:00.500000"}""")
    assert(v == java.sql.Timestamp.from(
      java.time.Instant.parse("2022-01-01T23:00:00.500Z")))
  }

  test("getRowDivisions matches the reference unit vectors") {
    // tests/test_repartition.py:20-53
    assert(PDataset.getRowDivisions(Seq(3L, 5L, 2L, 7L), 5L) ==
      Vector((1, 2L), (3, 0L), (3, 5L)))
    assert(PDataset.getRowDivisions(Seq(5L, 5L), 5L) == Vector((1, 0L)))
    assert(PDataset.getRowDivisions(Seq(10L), 3L) ==
      Vector((0, 3L), (0, 6L), (0, 9L)))
    assert(PDataset.getRowDivisions(Seq(4L), 5L) == Vector.empty)
    // empty partitions: boundary on an edge binds to the latest start
    assert(PDataset.getRowDivisions(Seq(3L, 0L, 5L), 3L) ==
      Vector((2, 0L), (2, 3L)))
  }
}
