package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PDataset
import graft.operators.DeletionVectors

/** Measures what a PENDING deletion-vector window costs readers, to
  * ground the materialize-cadence guidance in the README.
  *
  * Three read paths over the same table (orders with ~1.5% of rows
  * marked deleted):
  *
  *   1. `format("graft")` while vectors pend — since round 12 the
  *      extensions rule splices the native merge-on-read plan in
  *      during analysis, so this should track path 2 (before, the V1
  *      `PrunedFilteredScan` exited through `.rdd`, paying an
  *      InternalRow -> Row conversion above the anti join);
  *   2. `DeletionVectors.scan` — the same merge-on-read anti join as
  *      a plain DataFrame;
  *   3. `format("graft")` after materialize — the vectors folded in,
  *      back to the plain vectorized parquet relation.
  *
  * Usage: sbt "runMain graft.examples.DvReadOverhead [sfDir] [reps]"
  */
object DvReadOverhead {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("dv-overhead")
      .resolve("t").toString
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val ds = PDataset.fromDataFrame(orders, Seq("o_orderkey"))
    ds.repartition(math.max(2000L, ds.sizes.get.sum / 24)).writeParquet(dir)
    DeletionVectors.deleteKeys(spark, dir,
      orders.filter(col("o_orderkey") % 67 === 0).select("o_orderkey"))

    // a read that touches every surviving row and several columns
    def consume(df: DataFrame): Long =
      df.agg(sum("o_totalprice"), count(lit(1)), max("o_orderdate"))
        .collect().length.toLong

    def time(label: String)(body: => Unit): Double = {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.length / 2)
      println(f"$label%-34s median $med%.3f s  (min ${times.head}%.3f)")
      med
    }

    consume(spark.read.parquet(s"$sfDir/orders.parquet")) // warmup
    val sql = time("pending DV, format(\"graft\")") {
      consume(spark.read.format("graft").load(dir))
    }
    val native = time("pending DV, DeletionVectors.scan") {
      consume(DeletionVectors.scan(spark, dir))
    }
    DeletionVectors.materialize(spark, dir)
    val folded = time("after materialize, format(\"graft\")") {
      consume(spark.read.format("graft").load(dir))
    }
    println(f"format(\"graft\") DV read vs native anti join: " +
      f"${sql / native}%.2fx; vs materialized columnar: ${sql / folded}%.2fx")
    spark.stop()
  }
}
