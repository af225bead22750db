package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PDataset
import graft.operators.{Constraints, Maintenance}
import Fixtures._

/** CHECK constraints: add validates existing data in one scan, every
  * row-adding write path enforces in one delta pass, TRUE/NULL pass
  * and FALSE violates, and schema evolution refuses to strand an
  * expression. */
class ConstraintsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def srcDF(n: Long): DataFrame =
    spark.range(0L, n).select(
      col("id").as("k"),
      (col("id") % 100).cast("double").as("price"),
      when(col("id") % 10 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("c"), col("id") % 7)).as("cat"))

  private def writeSrc(dir: String, n: Long): Unit =
    PDataset.fromDataFrame(srcDF(n), Seq("k"))
      .repartition(100L).writeParquet(dir)

  test("add validates existing data and records; violated add refuses") {
    val dir = tempDir("cons-add") + "/t"
    writeSrc(dir, 500)
    Constraints.add(spark, dir, "price_nonneg", "price >= 0")
    // NULL passes (ANSI CHECK): cat is null every 10th row, yet a
    // constraint over cat records fine
    Constraints.add(spark, dir, "cat_prefix", "cat LIKE 'c%'")
    assert(Constraints.list(spark, dir) ==
      Map("price_nonneg" -> "price >= 0", "cat_prefix" -> "cat LIKE 'c%'"))
    // an existing violation refuses with the offending count
    val e = intercept[Constraints.Violation] {
      Constraints.add(spark, dir, "big", "price > 50")
    }
    // ANSI CHECK price > 50 is violated by price <= 50: values 0..50
    // inclusive = 51 values, 5 cycles of id % 100 over 500 ids = 255.
    assert(e.getMessage.contains("255 existing"))
    // duplicate name and unparseable expression both refuse eagerly
    intercept[IllegalArgumentException] {
      Constraints.add(spark, dir, "price_nonneg", "price >= 0")
    }
    intercept[Exception] {
      Constraints.add(spark, dir, "broken", "price >=== 0")
    }
    assert(Constraints.list(spark, dir).size == 2)
  }

  test("upsert and merge enforce; deletes stay unguarded") {
    val dir = tempDir("cons-upsert") + "/t"
    writeSrc(dir, 300)
    Constraints.add(spark, dir, "price_nonneg", "price >= 0")
    val bad = Seq((1L, -5.0, "cX")).toDF("k", "price", "cat")
    val e = intercept[Constraints.Violation] {
      Maintenance.upsert(spark, dir, bad)
    }
    assert(e.getMessage.contains("price_nonneg") &&
      e.getMessage.contains("1 row(s)"))
    // the refused upsert left the table untouched
    assert(PDataset.scanParquet(spark, dir).toDF
      .filter(col("k") === 1L).head().getDouble(1) == 1.0)
    // a clean upsert and a delete both proceed
    Maintenance.upsert(spark, dir, Seq((1L, 7.0, "cX")).toDF("k", "price", "cat"))
    Maintenance.deleteKeys(spark, dir, Seq(2L).toDF("k"))
    assert(PDataset.scanParquet(spark, dir).toDF.count() == 299)
  }

  test("graft sink enforces on append and keeps constraints across overwrite") {
    val dir = tempDir("cons-sink") + "/t"
    srcDF(200).write.format("graft").option("index", "k").save(dir)
    Constraints.add(spark, dir, "price_nonneg", "price >= 0")
    intercept[Constraints.Violation] {
      Seq((900L, -1.0, "cX")).toDF("k", "price", "cat")
        .write.format("graft").option("index", "k")
        .mode("append").save(dir)
    }
    Seq((900L, 1.0, "cX")).toDF("k", "price", "cat")
      .write.format("graft").option("index", "k")
      .mode("append").save(dir)
    assert(spark.read.format("graft").load(dir).count() == 201)
    // Overwrite replaces the data but the table keeps its CHECKs —
    // and enforces them on the replacing data itself
    intercept[Constraints.Violation] {
      Seq((0L, -3.0, "cX")).toDF("k", "price", "cat")
        .write.format("graft").option("index", "k")
        .mode("overwrite").save(dir)
    }
    srcDF(50).write.format("graft").option("index", "k")
      .mode("overwrite").save(dir)
    assert(Constraints.list(spark, dir).keySet == Set("price_nonneg"))
    intercept[Constraints.Violation] {
      Maintenance.upsert(spark, dir,
        Seq((3L, -2.0, "cX")).toDF("k", "price", "cat"))
    }
  }

  test("engine-native append enforces in one delta pass") {
    val dir = tempDir("cons-append") + "/t"
    writeSrc(dir, 200)
    Constraints.add(spark, dir, "price_nonneg", "price >= 0")
    val delta = spark.range(1000L, 1010L).select(
      col("id").as("k"), lit(-1.0).as("price"), lit("cX").as("cat"))
    intercept[Constraints.Violation] {
      PDataset.fromDataFrame(delta, Seq("k")).writeParquet(dir, append = true)
    }
    PDataset.fromDataFrame(delta.withColumn("price", lit(2.0)), Seq("k"))
      .writeParquet(dir, append = true)
    assert(PDataset.scanParquet(spark, dir).toDF.count() == 210)
  }

  test("dropColumns refuses while a constraint references the column") {
    val dir = tempDir("cons-drop") + "/t"
    writeSrc(dir, 100)
    Constraints.add(spark, dir, "cat_prefix", "cat LIKE 'c%'")
    val e = intercept[IllegalStateException] {
      Maintenance.dropColumns(spark, dir, "cat")
    }
    assert(e.getMessage.contains("cat_prefix"))
    Constraints.drop(spark, dir, "cat_prefix")
    Maintenance.dropColumns(spark, dir, "cat")
    assert(!PDataset.scanParquet(spark, dir).toDF.columns.contains("cat"))
    // drop of an absent constraint is an idempotent no-op
    Constraints.drop(spark, dir, "cat_prefix")
  }

  test("audit counts violations per constraint in one pass") {
    val dir = tempDir("cons-audit") + "/t"
    writeSrc(dir, 100)
    Constraints.add(spark, dir, "price_nonneg", "price >= 0")
    Constraints.add(spark, dir, "cat_prefix", "cat LIKE 'c%'")
    val cand = Seq(
      (1L, -1.0, "cA"), (2L, 2.0, "xB"), (3L, -9.0, null),
      (4L, 4.0, "cC")).toDF("k", "price", "cat")
    // AQE-safe "one aggregate pass" pin: raw job counts vary with AQE
    // stage materialization, so count SQL executions instead — one for
    // the candidate aggregate (.head), one for collecting the local
    // result frame. Atomic: incremented on the listener-bus thread,
    // read on the test thread after the drain.
    val sqlExecs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          sqlExecs.incrementAndGet(); ()
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val got = try {
      val rows = Constraints.audit(spark, dir, cand)
        .orderBy("name").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
      org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
      rows
    } finally spark.sparkContext.removeSparkListener(listener)
    // NULL cat passes cat_prefix; both negative prices violate
    assert(got == Seq("cat_prefix" -> 1L, "price_nonneg" -> 2L))
    assert(sqlExecs.get() <= 2,
      s"audit should be one aggregate pass over the candidate plus the " +
        s"local result collect, ran ${sqlExecs.get()} SQL executions")
  }
}
