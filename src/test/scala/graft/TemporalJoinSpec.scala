package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** As-of and range joins on hand-built frames: tie handling at equal
  * timestamps, no-match nulls, forward direction, interval boundary
  * inclusivity, bucket-spanning intervals, overlapping-interval pair
  * multiplicity. */
class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(s + "Z"))

  lazy val quotes = Seq(
    (1L, ts("2024-01-01T10:00:00"), 100.0),
    (1L, ts("2024-01-01T10:05:00"), 101.0),
    (1L, ts("2024-01-01T10:10:00"), 102.0),
    (2L, ts("2024-01-01T10:07:00"), 50.0))
    .toDF("k", "ts", "px")

  lazy val trades = Seq(
    (1L, ts("2024-01-01T09:59:00"), "a"), // before any quote
    (1L, ts("2024-01-01T10:05:00"), "b"), // exactly on a quote
    (1L, ts("2024-01-01T10:07:30"), "c"), // between quotes
    (2L, ts("2024-01-01T10:08:00"), "d"), // other key
    (3L, ts("2024-01-01T10:00:00"), "e")) // key with no quotes
    .toDF("k", "ts", "tag")

  test("asof backward: latest quote at or before each trade") {
    val out = TemporalJoins.asofJoin(trades, quotes, Seq("k"), "ts")
      .orderBy("tag").collect()
      .map(r => (r.getAs[String]("tag"), Option(r.getAs[java.lang.Double]("px"))))
    assert(out.toSeq == Seq(
      ("a", None), ("b", Some(101.0)), ("c", Some(101.0)),
      ("d", Some(50.0)), ("e", None)))
  }

  test("asof forward: earliest quote at or after each trade") {
    val out = TemporalJoins.asofJoin(
      trades, quotes, Seq("k"), "ts", direction = "forward")
      .orderBy("tag").collect()
      .map(r => (r.getAs[String]("tag"), Option(r.getAs[java.lang.Double]("px"))))
    assert(out.toSeq == Seq(
      ("a", Some(100.0)), ("b", Some(101.0)), ("c", Some(102.0)),
      ("d", None), ("e", None)))
  }

  test("asof payload struct keeps columns from the same right row") {
    val snap = Seq(
      (1L, ts("2024-01-01T10:00:00"), "x0", 0),
      (1L, ts("2024-01-01T10:10:00"), "x1", 1))
      .toDF("k", "ts", "name", "ver")
    val out = TemporalJoins.asofJoin(
      Seq((1L, ts("2024-01-01T10:11:00"))).toDF("k", "ts"),
      snap, Seq("k"), "ts").collect()(0)
    assert(out.getAs[String]("name") == "x1" && out.getAs[Int]("ver") == 1)
  }

  test("asof rejects colliding payload columns and bad direction") {
    intercept[IllegalArgumentException](
      TemporalJoins.asofJoin(quotes, quotes, Seq("k"), "ts"))
    intercept[IllegalArgumentException](
      TemporalJoins.asofJoin(trades, quotes, Seq("k"), "ts", "nearest"))
  }

  test("range join: inclusive bounds, bucket spans, overlap multiplicity") {
    val iv = Seq(
      (1L, ts("2024-01-01T10:00:00"), ts("2024-01-01T10:10:00"), "w1"),
      (1L, ts("2024-01-01T10:05:00"), ts("2024-01-01T10:15:00"), "w2"), // overlaps w1
      (2L, ts("2024-01-01T09:00:00"), ts("2024-01-01T11:00:00"), "wide"))
      .toDF("k", "s", "e", "w")
    val rows = Seq(
      (1L, ts("2024-01-01T10:00:00"), "lo"),   // on w1 start
      (1L, ts("2024-01-01T10:10:00"), "both"), // in w1 (on end) and w2
      (1L, ts("2024-01-01T10:16:00"), "none"),
      (2L, ts("2024-01-01T10:30:00"), "mid"))  // interval spans many buckets
      .toDF("k", "ts", "tag")
    val out = TemporalJoins.rangeJoin(
      rows, "ts", iv, "s", "e", Seq("k"), bucketWidthMicros = 60L * 1000000L)
      .select("tag", "w").collect().map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(out == Set(("lo", "w1"), ("both", "w1"), ("both", "w2"),
      ("mid", "wide")))
  }

  test("salted join is row-identical to the plain equi-join") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val salted = graft.operators.Skew
      .saltedJoin(li, o, Seq("l_orderkey"), salts = 4)
    val plain = li.join(o, Seq("l_orderkey"))
    Fixtures.assertSameRows(salted, plain)
    // left join keeps unmatched left rows exactly once
    val lSalted = graft.operators.Skew
      .saltedJoin(li, o.filter(col("l_orderkey") % 2 === 0),
        Seq("l_orderkey"), salts = 4, how = "left")
    val lPlain = li.join(o.filter(col("l_orderkey") % 2 === 0),
      Seq("l_orderkey"), "left")
    Fixtures.assertSameRows(lSalted, lPlain)
  }

  test("salted right and full joins are row-identical to the plain joins") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .filter(col("l_orderkey") % 3 === 0) // leave right-only keys
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val rSalted = graft.operators.Skew
      .saltedJoin(li, o, Seq("l_orderkey"), salts = 4, how = "right")
    val rPlain = li.join(o, Seq("l_orderkey"), "right")
    assert(rSalted.columns.toSeq == rPlain.columns.toSeq)
    Fixtures.assertSameRows(rSalted, rPlain)
    val fSalted = graft.operators.Skew
      .saltedJoin(li, o, Seq("l_orderkey"), salts = 4, how = "full")
    val fPlain = li.join(o, Seq("l_orderkey"), "full")
    assert(fSalted.columns.toSeq == fPlain.columns.toSeq)
    Fixtures.assertSameRows(fSalted, fPlain)
    // unmatched rows on BOTH sides survive exactly once
    assert(fSalted.filter(col("l_quantity").isNull).count() ==
      fPlain.filter(col("l_quantity").isNull).count())
    assert(fSalted.filter(col("o_orderpriority").isNull).count() ==
      fPlain.filter(col("o_orderpriority").isNull).count())
  }

  test("range join differential vs plain theta join on events sample") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    val ev = raw.select(col("event_id"), col("user_id"), tsCol.as("ts"))
    val iv = ev.filter(col("event_id") % 7 === 0)
      .select(col("user_id"), col("ts").as("s"),
        (col("ts") + expr("INTERVAL 5 MINUTES")).as("e"),
        col("event_id").as("iv_id"))
    val got = TemporalJoins.rangeJoin(ev, "ts", iv, "s", "e",
      Seq("user_id"), bucketWidthMicros = 300L * 1000000L)
      .select("event_id", "iv_id")
    val want = ev.join(iv, Seq("user_id"))
      .filter(col("ts") >= col("s") && col("ts") <= col("e"))
      .select("event_id", "iv_id")
    Fixtures.assertSameRows(got, want)
  }
}
