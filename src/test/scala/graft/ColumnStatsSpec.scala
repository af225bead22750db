package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ColumnStats, PDataset}
import graft.operators.Maintenance
import Fixtures._

/** `_graft_colstats.json`: per-file min/max stats on non-index
  * columns prune planned files through the SQL surface, survive
  * appends and maintenance via update, and never prune wrongly for
  * files without an entry. */
class ColumnStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 10 files clustered on k; `v` correlates with k (v = 10k) so its
    * per-file ranges are disjoint, `noise` does not. */
  private def writeSrc(dir: String, n: Int): Unit = {
    val df = spark.range(0L, n).select(
      col("id").as("k"),
      (col("id") * 10).as("v"),
      (col("id") % 7).cast("double").as("noise"),
      concat(lit("p"), col("id")).as("payload"))
    PDataset.fromDataFrame(df, Seq("k")).repartition(n / 10L).writeParquet(dir)
  }

  test("ANALYZE TABLE builds the stats and Bloom sidecars via SQL " +
      "and both prune afterwards") {
    val dir = tempDir("colstats-analyze") + "/t"
    writeSrc(dir, 1000)
    val nFiles = graft.core.Sidecar.load(spark, dir).files.length
    val st = spark.sql(s"ANALYZE TABLE graft.`$dir` COMPUTE STATISTICS " +
      "FOR COLUMNS (v, noise)").head()
    assert(st.getString(0) == "stats" && st.getInt(2) == nFiles)
    assert(ColumnStats.exists(spark, dir))
    val pruned = spark.read.format("graft").load(dir)
      .filter(col("v") >= 2100L && col("v") < 2400L)
    assert(scannedFiles(pruned) == 1)
    assert(pruned.count() == 30L)
    // the Bloom form (Spark's bare-list column syntax accepted too)
    val bl = spark.sql(s"ANALYZE TABLE graft.`$dir` COMPUTE BLOOM " +
      "FPP 0.01 FOR COLUMNS payload").head()
    assert(bl.getString(0) == "bloom" && bl.getInt(2) == nFiles)
    val point = spark.read.format("graft").load(dir)
      .filter(col("payload") === "p555")
    assert(scannedFiles(point) == 1)
    assert(point.count() == 1L)
    // FPP on the stats form refuses
    val e = intercept[Exception] {
      spark.sql(s"ANALYZE TABLE graft.`$dir` COMPUTE STATISTICS " +
        "FPP 0.5 FOR COLUMNS (v)").collect()
    }
    assert(e.getMessage.contains("FPP"), e.getMessage)
  }

  test("ANALYZE TABLE ... FOR ALL COLUMNS covers every non-index " +
      "column of a supported type in one statement") {
    val dir = tempDir("colstats-analyze-all") + "/t"
    writeSrc(dir, 1000)
    // STATISTICS: v, noise AND payload are all stats-supported;
    // the index column k is excluded (lex bounds already prune it)
    val st = spark.sql(s"ANALYZE TABLE graft.`$dir` COMPUTE STATISTICS " +
      "FOR ALL COLUMNS").head()
    assert(st.getString(0) == "stats")
    assert(st.getString(1).split(",").toSet == Set("v", "noise", "payload"),
      st.getString(1))
    val pruned = spark.read.format("graft").load(dir)
      .filter(col("v") >= 2100L && col("v") < 2400L)
    assert(scannedFiles(pruned) == 1)
    // BLOOM: only the bloom-supported subset (payload is string ✓,
    // noise is double ✗)
    val bl = spark.sql(s"ANALYZE TABLE graft.`$dir` COMPUTE BLOOM " +
      "FOR ALL COLUMNS").head()
    assert(bl.getString(0) == "bloom")
    assert(bl.getString(1).split(",").toSet == Set("v", "payload"),
      bl.getString(1))
    val point = spark.read.format("graft").load(dir)
      .filter(col("payload") === "p555")
    assert(scannedFiles(point) == 1)
    assert(point.count() == 1L)
  }

  test("range filters on a stats column prune planned files") {
    val dir = tempDir("colstats-prune") + "/t"
    writeSrc(dir, 1000)
    ColumnStats.build(spark, dir, Seq("v", "noise"))
    // v in [2100, 2400): only the file holding k in [210, 240) can match
    val pruned = spark.read.format("graft").load(dir)
      .filter(col("v") >= 2100L && col("v") < 2400L)
    assert(scannedFiles(pruned) == 1, "expected 1 of 10 files planned")
    assert(pruned.count() == 30L)
    // a filter on a non-correlated stats column keeps every file
    // (ranges overlap) — no wrong pruning
    val wide = spark.read.format("graft").load(dir)
      .filter(col("noise") === 3.0)
    assert(scannedFiles(wide) == 10)
    assert(wide.count() === spark.range(0, 1000).filter(col("id") % 7 === 3)
      .count())
    // equality point lookup on the stats column
    val point = spark.read.format("graft").load(dir)
      .filter(col("v") === 5550L)
    assert(scannedFiles(point) == 1)
    assert(point.count() == 1L)
  }

  test("sink option(\"stats\") builds; appends extend incrementally") {
    val dir = tempDir("colstats-sink") + "/t"
    spark.range(0L, 500L)
      .select(col("id").as("k"), (col("id") * 10).as("v"))
      .write.format("graft").option("index", "k").option("files", "5")
      .option("stats", "v").save(dir)
    assert(ColumnStats.exists(spark, dir))
    val q1 = spark.read.format("graft").load(dir)
      .filter(col("v") >= 4000L)
    assert(scannedFiles(q1) == 1)
    // append lands new files and the sink extends the stats to them
    spark.range(500L, 600L)
      .select(col("id").as("k"), (col("id") * 10).as("v"))
      .write.format("graft").mode("append")
      .option("index", "k").option("files", "1").save(dir)
    val q2 = spark.read.format("graft").load(dir)
      .filter(col("v") >= 5000L)
    assert(scannedFiles(q2) == 1, "appended file should carry stats")
    assert(q2.count() == 100L)
    assert(spark.read.format("graft").load(dir).count() == 600L)
  }

  test("files without an entry are kept, and update repairs pruning") {
    val dir = tempDir("colstats-stale") + "/t"
    writeSrc(dir, 600)
    ColumnStats.build(spark, dir, Seq("v"))
    // a maintenance rewrite allocates fresh names; refreshBloom-style
    // upkeep re-stats them inside the op
    Maintenance.upsert(spark, dir,
      spark.range(100L, 130L).select(
        col("id").as("k"), lit(999999L).as("v"),
        lit(0.0).as("noise"), lit("u").as("payload")))
    // correctness first: the rewritten rows are visible through the
    // stats-pruned read (the upserted files' NEW ranges include them)
    val hot = spark.read.format("graft").load(dir)
      .filter(col("v") === 999999L)
    assert(hot.count() == 30L)
    // pruning still fires: the two rewritten files now span up to the
    // sentinel (kept for any upper range), but the rest prune — this
    // range overlaps 2 original files + the 2 rewritten ones at most
    val cold = spark.read.format("graft").load(dir)
      .filter(col("v") >= 2100L && col("v") < 2400L)
    assert(cold.count() == 30L)
    assert(scannedFiles(cold) <= 4,
      "stats upkeep should keep range pruning effective after upsert")
    // a range fully inside the first (untouched) file reads only it
    val first = spark.read.format("graft").load(dir)
      .filter(col("v") < 500L)
    assert(first.count() == 50L)
    assert(scannedFiles(first) == 1)
  }

  test("null handling: IS NULL keeps only possibly-null files") {
    val dir = tempDir("colstats-null") + "/t"
    val df = spark.range(0L, 300L).select(
      col("id").as("k"),
      when(col("id") < 100, lit(null).cast("long"))
        .otherwise(col("id") * 10).as("v"))
    PDataset.fromDataFrame(df, Seq("k")).repartition(100).writeParquet(dir)
    ColumnStats.build(spark, dir, Seq("v"))
    // the index splits 300 rows into 4 files (99/100/100/1 rows), so
    // the first TWO carry nulls (k=99 lands in file 1)
    val nulls = spark.read.format("graft").load(dir)
      .filter(col("v").isNull)
    assert(scannedFiles(nulls) <= 2, "only null-carrying files")
    assert(nulls.count() == 100L)
    // comparisons never match nulls: the all-null file is pruned even
    // though its (null) range cannot be compared
    val cmp = spark.read.format("graft").load(dir)
      .filter(col("v") < 1500L)
    assert(scannedFiles(cmp) == 1)
    assert(cmp.count() == 50L)
  }

  test("deleteWhere prunes by column stats on a non-index column") {
    val dir = tempDir("colstats-dv") + "/t"
    writeSrc(dir, 1000) // 10 files; v = 10k correlates with the index
    ColumnStats.build(spark, dir, Seq("v"))
    var read = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read += e.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    val rep = try {
      val r = graft.operators.DeletionVectors.deleteWhere(spark, dir,
        col("v") >= 2100L && col("v") < 2400L && col("noise") =!= 5.0)
      org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
      r
    } finally spark.sparkContext.removeSparkListener(listener)
    // v in [2100, 2400) is k in [210, 240): 30 rows minus those with
    // k % 7 == 5 (215, 222, 229, 236)
    assert(rep.marked == 26 && rep.affectedFiles == 1, s"$rep")
    assert(read < 300,
      s"expected a stats-pruned deleteWhere scan, read $read records")
    assert(graft.operators.DeletionVectors.scan(spark, dir).count()
      == 1000 - 26)
  }

  test("materialize re-stats the files it rewrites") {
    val dir = tempDir("colstats-mat") + "/t"
    writeSrc(dir, 600)
    ColumnStats.build(spark, dir, Seq("v"))
    graft.operators.DeletionVectors.deleteWhere(spark, dir,
      col("v") >= 2100L && col("v") < 2400L)
    graft.operators.DeletionVectors.materialize(spark, dir)
    // the rewritten file carries fresh stats: a range inside it still
    // plans one file, and the deleted band is gone
    val q = spark.read.format("graft").load(dir)
      .filter(col("v") >= 2000L && col("v") < 2500L)
    assert(scannedFiles(q) <= 2)
    assert(q.count() == 50L - 30L) // [2000,2500) minus deleted [2100,2400)
  }

  test("dropColumns removes stats entries so later refreshes survive") {
    val dir = tempDir("colstats-drop") + "/t"
    writeSrc(dir, 300)
    ColumnStats.build(spark, dir, Seq("v", "noise"))
    Maintenance.dropColumns(spark, dir, "v")
    // every later maintenance op re-stats its new files through
    // ColumnStats.update — a ghost 'v' entry would make that stats
    // pass throw on the missing column
    Maintenance.upsert(spark, dir, spark.range(100L, 130L).select(
      col("id").as("k"), lit(9.0).as("noise"),
      lit("u").as("payload")))
    assert(spark.read.format("graft").load(dir)
      .filter(col("noise") === 9.0).count() == 30L)
    // dropping the last recorded column removes the sidecar entirely
    Maintenance.dropColumns(spark, dir, "noise")
    assert(!ColumnStats.exists(spark, dir))
  }

  test("NaN/Infinity double columns build valid stats and never drop rows") {
    val dir = tempDir("colstats-nan") + "/t"
    // all three non-finite specials land in the FIRST file (k<100)
    val df = spark.range(0L, 400L).select(
      col("id").as("k"),
      when(col("id") === 42, lit(Double.NaN))
        .when(col("id") === 57, lit(Double.PositiveInfinity))
        .when(col("id") === 73, lit(Double.NegativeInfinity))
        .otherwise(col("id").cast("double")).as("x"))
    PDataset.fromDataFrame(df, Seq("k")).repartition(100).writeParquet(dir)
    // pre-fix this corrupted the sidecar (bare NaN token) and every
    // later read threw; now it round-trips through {"$float": ...}
    ColumnStats.build(spark, dir, Seq("x"))
    val rel = spark.read.format("graft").load(dir)
    // Spark orders NaN greatest (above +Infinity): x > 395 matches
    // 396..399 plus the NaN and +Infinity rows — the special file
    // (max = NaN) must stay planned
    assert(rel.filter(col("x") > 395.0).count() == 6L)
    // the special file (min = -Inf, max = NaN) is kept for ANY range;
    // untouched files still prune
    val hi = rel.filter(col("x") >= 250.0 && col("x") < 290.0)
    assert(hi.count() == 40L)
    assert(scannedFiles(hi) <= 2, "special file + the matching file")
    // -Infinity sorts least: a low range must keep its file
    assert(rel.filter(col("x") < -1e100).count() == 1L)
  }

  test("a corrupt stats sidecar degrades reads and self-heals on update") {
    val dir = tempDir("colstats-corrupt") + "/t"
    writeSrc(dir, 300)
    ColumnStats.build(spark, dir, Seq("v"))
    // simulate a pre-$float build over NaN data: unparseable JSON
    val p = new org.apache.hadoop.fs.Path(dir, "_graft_colstats.json")
    val (fs, _) = graft.core.GraftFs.resolve(spark, dir)
    graft.core.GraftFs.writeString(fs, p, "{\"cols\": [NaN")
    // reads degrade to "no stats" instead of throwing
    val q = spark.read.format("graft").load(dir)
      .filter(col("v") >= 100L && col("v") < 200L)
    assert(q.count() == 10L)
    // the next maintenance op's stats upkeep deletes the corrupt
    // sidecar instead of failing the op
    Maintenance.upsert(spark, dir, spark.range(0L, 5L).select(
      col("id").as("k"), lit(7L).as("v"), lit(0.0).as("noise"),
      lit("u").as("payload")))
    assert(!ColumnStats.exists(spark, dir))
    assert(spark.read.format("graft").load(dir)
      .filter(col("v") === 7L).count() == 5L)
  }

  test("high-precision decimal stats prune exactly, not through doubles") {
    val dir = tempDir("colstats-dec") + "/t"
    // 20-significant-digit decimals: adjacent values are
    // indistinguishable as doubles, so double-rounded bounds would
    // prune the matching file away
    val df = spark.range(0L, 400L).select(
      col("id").as("k"),
      (lit(new java.math.BigDecimal("98765432109876543210"))
        .cast("decimal(38,0)") +
        col("id").cast("decimal(38,0)")).as("d"))
    PDataset.fromDataFrame(df, Seq("k")).repartition(100).writeParquet(dir)
    ColumnStats.build(spark, dir, Seq("d"))
    val target = new java.math.BigDecimal("98765432109876543335") // k=125
    val q = spark.read.format("graft").load(dir)
      .filter(col("d") === lit(target).cast("decimal(38,0)"))
    assert(q.count() == 1L, "exact decimal pruning must keep the match")
    assert(scannedFiles(q) == 1)
  }

  test("zero-row files get explicit entries — coverage stays complete") {
    val d = tempDir("colstats-zero")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    spark.range(0L, 50L).select(col("id").as("k"), (col("id") * 2).as("v"))
      .coalesce(1).write.parquet(d + "/full")
    spark.range(0L, 0L).select(col("id").as("k"), (col("id") * 2).as("v"))
      .coalesce(1).write.parquet(d + "/empty")
    def one(sub: String): String = {
      val dir = new java.io.File(d, sub)
      dir.listFiles().map(_.toString).filter(_.endsWith(".parquet")).head
    }
    val entries = ColumnStats.fileEntries(
      spark, Seq(one("full"), one("empty")), Seq("v"),
      graft.core.Sidecar.Meta(Vector.empty, Seq("k"), Vector.empty,
        Vector.empty, Vector.empty, -1L, schema))
    assert(entries.length == 2,
      "the zero-row file must get an explicit entry, not vanish")
    val empty = entries.find(
      _("name").toString == new java.io.File(one("empty")).getName).get
    val st = empty("stats").asInstanceOf[Seq[Any]].head
      .asInstanceOf[Map[String, Any]]
    assert(st("min") == null && st("max") == null && st("nulls") == 0L)
    assert(st.contains("sum") && st("sum") == null)
  }

  test("unsupported types and unknown columns are rejected up front") {
    val dir = tempDir("colstats-reject") + "/t"
    val df = spark.range(0L, 50L).select(
      col("id").as("k"), array(col("id")).as("arr"))
    PDataset.fromDataFrame(df, Seq("k")).writeParquet(dir)
    assertThrows[IllegalArgumentException] {
      ColumnStats.build(spark, dir, Seq("nope"))
    }
    assertThrows[IllegalArgumentException] {
      ColumnStats.build(spark, dir, Seq("arr"))
    }
  }
}
