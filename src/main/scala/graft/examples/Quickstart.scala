package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.PDataset

/** End-to-end usage demo of the partitioned-dataset API on the
  * synthetic TPC-H-ish test data. Run with:
  *   sbt "runMain graft.examples.Quickstart [sfDir]"
  */
object Quickstart {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-quickstart")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. Scan a bare parquet file (1 partition, no stats yet).
    val li = PDataset.scanParquet(spark, s"$sfDir/lineitem.parquet")
    println(s"scanned: ${li.npartitions} partition(s), knownBounds=${li.knownBounds}")

    // 2. Declare an index and collect stats (one pass).
    val indexed = li.reindex(Seq("l_shipdate"))
    println(s"reindexed: sizes=${indexed.sizes.get.toList}, " +
      s"bounds=[${indexed.lowerBounds.get.head.map(_.orNull).mkString(",")}] .. " +
      s"[${indexed.upperBounds.get.head.map(_.orNull).mkString(",")}]")

    // 3. Range-repartition on the index and persist with sidecars
    //    (single-shuffle fast write).
    val out = java.nio.file.Files.createTempDirectory("graft-quickstart-")
      .resolve("lineitem_by_shipdate").toString
    val persisted = indexed.repartition(1000).writeParquet(out)
    println(s"persisted: ${persisted.npartitions} partitions at $out " +
      s"disjoint=${persisted.isDisjoint}")
    println(s"  sizes=${persisted.sizes.get.toList}")

    // 4. Re-open: stats load from the sidecar before any Spark job.
    val reopened = PDataset.scanParquet(spark, out)
    println(s"reopened: knownBounds=${reopened.knownBounds} " +
      s"npartitions=${reopened.npartitions}")

    // 5. Partition-pruned slice: only overlapping files are read.
    val lo = reopened.lowerBounds.get(1)
    val hi = reopened.lowerBounds.get(reopened.npartitions - 1)
    val sliced = reopened.slice(lo, hi)
    println(s"slice [${lo.head.orNull} .. ${hi.head.orNull}): " +
      s"${sliced.npartitions}/${reopened.npartitions} partitions kept, " +
      s"rows=${sliced.toDF.count()}")

    // 6. Full Spark surface through toDF: aggregate the slice.
    val agg = sliced.toDF.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
      .orderBy("l_returnflag")
    agg.show()

    // 7. Co-partitioned join on shared index columns.
    val orders = PDataset
      .scanParquet(spark, s"$sfDir/orders.parquet")
      .rename(Map("o_orderkey" -> "orderkey"))
      .reindex(Seq("orderkey"))
    val lByKey = li.rename(Map("l_orderkey" -> "orderkey"))
      .reindex(Seq("orderkey"))
    val joined = lByKey.join(orders, "inner")
    println(s"join partitions=${joined.npartitions}, " +
      s"rows=${joined.toDF.count()}")

    // 8. Table maintenance in place on a keyed dataset: delete an
    //    index range (covered files dropped unread), one-row keyed
    //    upsert (only its routed partition rewritten) with the
    //    outgoing generation retained, then time travel and vacuum.
    import graft.operators.Maintenance
    val ordsDir = java.nio.file.Files.createTempDirectory("graft-quickstart-")
      .resolve("orders_by_key").toString
    PDataset.scanParquet(spark, s"$sfDir/orders.parquet")
      .reindex(Seq("o_orderkey")).repartition(200).writeParquet(ordsDir)
    val del = Maintenance.deleteRange(spark, ordsDir,
      lb = Vector(Some(100L)), ub = Vector(Some(300L)))
    println(s"deleteRange([100, 300)): dropped=${del.dropped} " +
      s"rewritten=${del.rewritten} untouched=${del.untouched}")
    val one = PDataset.scanParquet(spark, ordsDir).toDF
      .orderBy("o_orderkey").limit(1)
      .withColumn("o_orderpriority", lit("0-UPSERTED"))
    val ups = Maintenance.upsert(spark, ordsDir, one, retain = true)
    println(s"upsert(1 row, retain): rewritten=${ups.rewritten} " +
      s"untouched=${ups.untouched}; versions=${Maintenance.versions(spark, ordsDir)}")
    val old = Maintenance.scanVersion(spark, ordsDir, 0)
    println(s"time travel v0: rows=${old.toDF.count()} (current=" +
      s"${PDataset.scanParquet(spark, ordsDir).toDF.count()})")
    println(s"vacuum: removed ${Maintenance.vacuum(spark, ordsDir)} stale file(s)")

    spark.stop()
  }
}
