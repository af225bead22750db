package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry returns rows > 0 on sf0.001. */
class EntrySpec extends AnyFunSuite {
  test("SparkEntry.entry returns rows") {
    val n = SparkEntry.entry(TestSpark.spark).count()
    assert(n > 0, s"entry returned $n rows")
  }

  test("every query has an oracle") {
    val qs = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(qs), s"orphan oracles: ${oracles -- qs}")
    assert(qs == oracles, s"rows-only queries: ${qs -- oracles}")
  }

  test("declared query count is pinned (update deliberately)") {
    // Deliberate pin: adding a query means bumping this number in the
    // same commit, so prose references never silently drift again.
    assert(SparkEntry.queries.size == 183,
      s"declared queries: ${SparkEntry.queries.size}; update this pin " +
        "alongside any inventory change")
  }
}
