package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Lex
import graft.core.Lex.Bound

/** Property tests for the null-first lexicographic ordering — the
  * correctness keystone under every bound comparison, partition
  * pruning decision and division route in the engine. lexCmp must be
  * a total order (with null as the minimum at every position) and
  * agree with the generic tuple order derived from nullableCmp.
  * Generators run from a fixed seed: deterministic, no flake.
  */
class LexPropertySpec extends AnyFunSuite {

  /** n deterministic samples of a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  /** One bound position holds null or a value of ONE type per
    * position (mixed types never compare within a column). */
  private def boundOfTypes(types: Seq[Int]): Gen[Bound] =
    Gen.sequence[Vector[Option[Any]], Option[Any]](types.map { t =>
      val g: Gen[Any] = t match {
        case 0 => Gen.chooseNum(-1000L, 1000L).map(l => l: Any)
        case 1 => Gen.oneOf("", "a", "ab", "b", "zz", "A9").map(s => s: Any)
        case _ => Gen.chooseNum(-10.0, 10.0).map(d => d: Any)
      }
      Gen.option(g)
    })

  private val tripleGen: Gen[(Bound, Bound, Bound)] =
    for {
      n <- Gen.chooseNum(1, 4)
      ts <- Gen.listOfN(n, Gen.chooseNum(0, 2))
      a <- boundOfTypes(ts)
      b <- boundOfTypes(ts)
      c <- boundOfTypes(ts)
    } yield (a, b, c)

  test("lexCmp is a total order: antisymmetric, transitive, null-first") {
    val cases = samples(tripleGen, 2000)
    assert(cases.length >= 1900, "generator must produce samples")
    cases.foreach { case (a, b, c) =>
      val ab = Lex.lexCmp(a, b)
      val ba = Lex.lexCmp(b, a)
      assert(Integer.signum(ab) == -Integer.signum(ba), s"$a vs $b")
      // transitivity: a <= b <= c implies a <= c
      if (ab <= 0 && Lex.lexCmp(b, c) <= 0)
        assert(Lex.lexCmp(a, c) <= 0, s"$a <= $b <= $c")
      // consistency with the component-wise order
      val ref = a.zip(b).iterator
        .map { case (x, y) => Lex.nullableCmp(x, y) }
        .find(_ != 0).getOrElse(0)
      assert(Integer.signum(ab) == Integer.signum(ref), s"$a vs $b")
      // null-first: nulling the first position never makes a bound larger
      assert(Lex.lexCmp(a.updated(0, None), a) <= 0, a.toString)
    }
  }

  test("lexMin/lexMax are the order's meet and join") {
    samples(tripleGen, 1000).foreach { case (a, b, _) =>
      val mn = Lex.lexMin(a, b)
      val mx = Lex.lexMax(a, b)
      assert(Lex.lexCmp(mn, a) <= 0 && Lex.lexCmp(mn, b) <= 0)
      assert(Lex.lexCmp(mx, a) >= 0 && Lex.lexCmp(mx, b) >= 0)
      assert((mn eq a) || (mn eq b))
      assert((mx eq a) || (mx eq b))
    }
  }
}
