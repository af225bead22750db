package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PDataset
import graft.operators.Maintenance
import Fixtures._

/** The V2 `TableCatalog` (`graft.sources.GraftCatalog`): name-based
  * CREATE / INSERT / SELECT, Spark-native VERSION AS OF / TIMESTAMP
  * AS OF time travel resolved through the retained-generation
  * ledger, sidecar file pruning through the DSv2 scan, and schema
  * evolution via ALTER TABLE — all against the same directories the
  * path API addresses. */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val warehouse: String = {
    val wh = tempDir("graft-catalog-wh")
    spark.conf.set("spark.sql.catalog.gcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    wh
  }

  /** Files planned by `df`'s scan — V2 `BatchScanExec` (extension-less
    * catalog reads) AND V1 `FileSourceScanExec` (extension sessions,
    * where [[graft.sources.GraftV2ScanSubstitution]] splices catalog
    * reads down to the V1 graft relation). */
  private def v2ScannedFiles(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan)
      case b: BatchScanExec => b.inputPartitions.flatMap {
        case fp: FilePartition => fp.files.map(_.urlEncodedPath)
      }.distinct.length
      case f: FileSourceScanExec => f.metrics("numFiles").value.toInt
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("CREATE TABLE + INSERT INTO + SELECT by name round-trip, and " +
      "the directory stays path-API-compatible") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.kv (k BIGINT, grp BIGINT, " +
      "payload STRING) USING graft TBLPROPERTIES('index'='k')")
    assert(spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getString(1)).contains("kv"))
    spark.range(0, 300).select(col("id").as("k"), (col("id") % 7).as("grp"),
      concat(lit("p"), col("id")).as("payload"))
      .createOrReplaceTempView("kv_src")
    spark.sql("INSERT INTO gcat.db.kv SELECT * FROM kv_src")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.db.kv")
      .head().getLong(0) == 300L)
    // the same directory opens through the path API — one table,
    // two addressings
    val byPath = PDataset.scanParquet(spark, s"$warehouse/db/kv")
    assert(byPath.toDF.count() == 300L)
    assert(byPath.indexColumns == Seq("k"))
    // a second INSERT INTO appends (the sink's O(delta) append)
    spark.sql("INSERT INTO gcat.db.kv " +
      "SELECT k + 1000, grp, payload FROM kv_src WHERE k < 10")
    assert(spark.table("gcat.db.kv").count() == 310L)
    // INSERT OVERWRITE replaces the content, keeping the table
    spark.sql("INSERT OVERWRITE gcat.db.kv " +
      "SELECT * FROM kv_src WHERE k < 100")
    assert(spark.table("gcat.db.kv").count() == 100L)
  }

  test("pushed filters prune planned files through the sidecar in the " +
      "DSv2 scan") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gcat.db.pruned")
    spark.sql("CREATE TABLE gcat.db.pruned (k BIGINT, v STRING) " +
      "USING graft PARTITIONED BY (k)")
    spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
      .createOrReplaceTempView("pruned_src")
    // chunked inserts: each append lands its own disjoint-range file
    (0 until 1000 by 200).foreach(lo => spark.sql(
      s"INSERT INTO gcat.db.pruned SELECT * FROM pruned_src " +
        s"WHERE k >= $lo AND k < ${lo + 200}"))
    val total = v2ScannedFiles(spark.table("gcat.db.pruned"))
    assert(total >= 4, s"fixture should span several files, got $total")
    val narrow = v2ScannedFiles(
      spark.sql("SELECT * FROM gcat.db.pruned WHERE k >= 990"))
    assert(narrow <= 1,
      s"a point-range read must prune to ~1 file, planned $narrow/$total")
  }

  test("VERSION AS OF resolves through the ledger, equal to " +
      "Maintenance.scanVersion; TIMESTAMP AS OF too; snapshots are " +
      "read-only") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gcat.db.tt")
    spark.sql("CREATE TABLE gcat.db.tt (k BIGINT, payload STRING) " +
      "USING graft TBLPROPERTIES('index'='k')")
    spark.range(0, 200).select(col("id").as("k"),
      concat(lit("p"), col("id")).as("payload"))
      .createOrReplaceTempView("tt_src")
    spark.sql("INSERT INTO gcat.db.tt SELECT * FROM tt_src")
    val dir = s"$warehouse/db/tt"
    Thread.sleep(20)
    val midTs = System.currentTimeMillis()
    Thread.sleep(20)
    Maintenance.deleteKeys(spark, dir, Seq(5L, 6L).toDF("k"),
      retain = true)
    // VERSION AS OF 0 = the archived pre-delete generation,
    // bit-for-bit what scanVersion serves
    val v0 = spark.sql("SELECT * FROM gcat.db.tt VERSION AS OF 0")
    assert(v0.count() == 200L)
    assertSameRows(v0, Maintenance.scanVersion(spark, dir, 0).toDF)
    assert(spark.table("gcat.db.tt").count() == 198L)
    // TIMESTAMP AS OF an instant before the delete resolves to the
    // same snapshot (micros per the TableCatalog contract)
    val ts = java.time.Instant.ofEpochMilli(midTs).toString
    assert(spark.sql(
      s"SELECT count(*) AS n FROM gcat.db.tt TIMESTAMP AS OF '$ts'")
      .head().getLong(0) == 200L)
    // a snapshot refuses writes (Spark's grammar already rejects
    // INSERT INTO ... VERSION AS OF; the table guards directly too)
    import org.apache.spark.sql.connector.catalog.{Identifier,
      SupportsWrite, TableCatalog}
    val cat = org.apache.spark.sql.classic.SparkSession.active
      .sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[TableCatalog]
    val snap = cat.loadTable(Identifier.of(Array("db"), "tt"), "0")
    val e = intercept[IllegalArgumentException] {
      snap.asInstanceOf[SupportsWrite].newWriteBuilder(null)
    }
    assert(e.getMessage.contains("read-only"), e.getMessage)
  }

  test("ALTER TABLE ADD/DROP COLUMNS map onto metadata-only schema " +
      "evolution; rename and drop manage the directory") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gcat.db.evo")
    spark.sql("DROP TABLE IF EXISTS gcat.db.evo2")
    spark.sql("CREATE TABLE gcat.db.evo (k BIGINT, v DOUBLE) " +
      "USING graft TBLPROPERTIES('index'='k')")
    spark.range(0, 50).select(col("id").as("k"),
      (col("id") * 1.5).as("v")).createOrReplaceTempView("evo_src")
    spark.sql("INSERT INTO gcat.db.evo SELECT * FROM evo_src")
    spark.sql("ALTER TABLE gcat.db.evo ADD COLUMNS (tag STRING)")
    val widened = spark.table("gcat.db.evo")
    assert(widened.columns.toSeq == Seq("k", "v", "tag"))
    assert(widened.filter(col("tag").isNull).count() == 50L)
    spark.sql("ALTER TABLE gcat.db.evo DROP COLUMN tag")
    assert(spark.table("gcat.db.evo").columns.toSeq == Seq("k", "v"))
    // rename moves the directory; the old name is gone
    spark.sql("ALTER TABLE gcat.db.evo RENAME TO db.evo2")
    assert(spark.table("gcat.db.evo2").count() == 50L)
    assert(!spark.catalog.tableExists("gcat.db.evo"))
    // the statement DDL addresses the SAME table by path AND by name
    spark.sql(s"ALTER TABLE graft.`$warehouse/db/evo2` " +
      "ADD CONSTRAINT v_pos CHECK (v >= 0)")
    assert(spark.sql(s"SHOW CONSTRAINTS graft.`$warehouse/db/evo2`")
      .head().getString(0) == "v_pos")
    assert(spark.sql("SHOW CONSTRAINTS gcat.db.evo2")
      .head().getString(0) == "v_pos")
    spark.sql("ALTER TABLE gcat.db.evo2 DROP CONSTRAINT v_pos")
    assert(spark.sql("SHOW CONSTRAINTS gcat.db.evo2").isEmpty)
    assert(spark.sql("DESCRIBE HISTORY gcat.db.evo2").count() >= 1L)
    spark.sql("DROP TABLE gcat.db.evo2")
    assert(!spark.catalog.tableExists("gcat.db.evo2"))
  }

  test("extension sessions splice catalog reads to the V1 relation: " +
      "metadata-only count(*) folds and DV-pending tables read " +
      "merge-on-read") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gcat.db.spliced")
    spark.sql("CREATE TABLE gcat.db.spliced (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES('index'='k')")
    spark.range(0, 400).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
      .createOrReplaceTempView("spliced_src")
    spark.sql("INSERT INTO gcat.db.spliced SELECT * FROM spliced_src")
    // name-based count(*) answers from sidecar row counts: a
    // LocalTableScan, zero files read — the V1 relation's
    // MetadataCount rule firing through the splice
    val cnt = spark.sql("SELECT count(*) AS n FROM gcat.db.spliced")
    assert(cnt.head().getLong(0) == 400L)
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = (cnt.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("LocalTableScan") &&
      !plan.contains("BatchScan") && !plan.contains("FileScan"),
      s"catalog count(*) must fold from metadata:\n$plan")
    // pending deletion vectors: the raw V2 scan refuses, the spliced
    // read serves merge-on-read — deleted rows invisible by name
    graft.operators.DeletionVectors.deleteKeys(spark,
      s"$warehouse/db/spliced", Seq(1L, 2L, 3L).toDF("k"))
    assert(spark.table("gcat.db.spliced").count() == 397L)
    // writes still route through the V2 write path (target untouched
    // by the splice) and land on the merged state
    graft.operators.DeletionVectors.materialize(spark,
      s"$warehouse/db/spliced")
    spark.sql("INSERT INTO gcat.db.spliced " +
      "SELECT k + 9000, v FROM spliced_src WHERE k < 3")
    assert(spark.table("gcat.db.spliced").count() == 400L)
  }

  test("CTAS and the DataFrameWriterV2 API land through the graft sink") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gcat.db.ctas")
    spark.range(0, 100).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
      .createOrReplaceTempView("ctas_src")
    // CREATE TABLE ... AS SELECT: createTable + the V1Write append
    spark.sql("CREATE TABLE gcat.db.ctas USING graft " +
      "TBLPROPERTIES('index'='k') AS SELECT * FROM ctas_src")
    assert(spark.table("gcat.db.ctas").count() == 100L)
    // df.writeTo(...).append() — the V2 writer API
    spark.range(100, 120).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
      .writeTo("gcat.db.ctas").append()
    assert(spark.table("gcat.db.ctas").count() == 120L)
    // the result is a real graft dataset with the declared clustering
    val ds = PDataset.scanParquet(spark, s"$warehouse/db/ctas")
    assert(ds.indexColumns == Seq("k") && ds.toDF.count() == 120L)
  }

  test("option(\"table\", ...) addresses catalog tables from the " +
      "path-based entry points — batch read/write and the CDC stream") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gcat.db.named")
    spark.sql("CREATE TABLE gcat.db.named (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES('index'='k')")
    spark.range(0, 100).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
      .createOrReplaceTempView("named_src")
    spark.sql("INSERT INTO gcat.db.named SELECT * FROM named_src")
    // batch read by name, composing with time travel options
    assert(spark.read.format("graft")
      .option("table", "gcat.db.named").load().count() == 100L)
    Maintenance.deleteKeys(spark, s"$warehouse/db/named",
      Seq(7L).toDF("k"), retain = true)
    assert(spark.read.format("graft").option("table", "gcat.db.named")
      .option("version", "0").load().count() == 100L)
    // batch write by name
    spark.range(100, 110).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
      .write.format("graft").mode("append")
      .option("table", "gcat.db.named").option("index", "k").save()
    assert(spark.table("gcat.db.named").count() == 109L)
    // the change-feed stream by name
    val sink = "named_cdc_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format("graft")
      .option("table", "gcat.db.named")
      .option("startingVersion", "0").load()
      .writeStream.outputMode("append").format("memory")
      .queryName(sink).start()
    try {
      q.processAllAvailable()
      // the feed since v0: one delete (k=7) + ten appended inserts
      assert(spark.table(sink).count() == 11L)
    } finally q.stop()
    // an unresolvable name refuses with guidance
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft")
        .option("table", "nosuch.db.t").load().collect()
    }
    assert(e.getMessage.contains("graft catalog"), e.getMessage)
  }

  test("DELETE FROM marks deletion vectors (zero rewrites); TRUNCATE " +
      "TABLE is metadata-only and keeps the table") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gcat.db.del")
    spark.sql("CREATE TABLE gcat.db.del (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES('index'='k')")
    spark.range(0, 100).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
      .createOrReplaceTempView("del_src")
    spark.sql("INSERT INTO gcat.db.del SELECT * FROM del_src")
    val dir = s"$warehouse/db/del"
    val mtimes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    spark.sql("DELETE FROM gcat.db.del WHERE k < 10 OR v = 'v50'")
    // merge-on-read: rows invisible, vectors pending, no file touched
    assert(spark.table("gcat.db.del").count() == 89L)
    assert(graft.operators.DeletionVectors.exists(spark, dir))
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && mtimes.contains(f.getName))
      .foreach(f => assert(f.lastModified() == mtimes(f.getName),
        s"${f.getName} was rewritten by DELETE FROM"))
    // fold the vectors in, then TRUNCATE: schema + clustering survive
    graft.operators.DeletionVectors.materialize(spark, dir)
    spark.sql("TRUNCATE TABLE gcat.db.del")
    assert(spark.table("gcat.db.del").count() == 0L)
    spark.sql("INSERT INTO gcat.db.del SELECT * FROM del_src WHERE k < 5")
    assert(spark.table("gcat.db.del").count() == 5L)
    assert(graft.core.Sidecar.load(spark, dir).indexColumns == Seq("k"))
  }

  test("CREATE TABLE without clustering columns refuses with guidance") {
    warehouse
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db.noidx (k BIGINT) USING graft")
    }
    assert(e.getMessage.contains("index") ||
      e.getMessage.contains("PARTITIONED"), e.getMessage)
  }

  test("PARTITIONED BY transforms map onto range clustering: days(d) " +
      "clusters on d, bucket(n, k) on k — and pruning fires") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.ev (d DATE, k BIGINT, v DOUBLE) " +
      "USING graft PARTITIONED BY (days(d))")
    assert(graft.core.Sidecar.load(spark, s"$warehouse/db/ev")
      .indexColumns == Seq("d"))
    spark.range(0, 400).selectExpr(
      "date_add(DATE'2026-01-01', CAST(id / 10 AS INT)) AS d",
      "id AS k", "id * 1.0 AS v").createOrReplaceTempView("ev_src")
    // four appends of disjoint day ranges -> at least four files
    // (AQE coalesces one small insert's shuffle to a single file)
    (0 until 4).foreach(i => spark.sql("INSERT INTO gcat.db.ev " +
      s"SELECT * FROM ev_src WHERE k >= ${i * 100} AND k < ${i * 100 + 100}"))
    val evFiles =
      graft.core.Sidecar.load(spark, s"$warehouse/db/ev").files.length
    assert(evFiles > 1)
    val dayQ = spark.sql(
      "SELECT * FROM gcat.db.ev WHERE d = DATE'2026-01-05'")
    assert(dayQ.count() == 10)
    assert(v2ScannedFiles(dayQ) < evFiles,
      "a one-day predicate must prune files via the d bounds")

    spark.sql("CREATE TABLE gcat.db.bk (k BIGINT, v DOUBLE) " +
      "USING graft PARTITIONED BY (bucket(8, k))")
    assert(graft.core.Sidecar.load(spark, s"$warehouse/db/bk")
      .indexColumns == Seq("k"))
    (0 until 4).foreach(i => spark.sql("INSERT INTO gcat.db.bk " +
      s"SELECT id AS k, id * 1.0 AS v FROM range(${i * 100}, ${i * 100 + 100})"))
    val bkFiles =
      graft.core.Sidecar.load(spark, s"$warehouse/db/bk").files.length
    assert(bkFiles > 1)
    val pointQ = spark.sql("SELECT * FROM gcat.db.bk WHERE k = 37")
    assert(pointQ.count() == 1)
    assert(v2ScannedFiles(pointQ) == 1,
      "a point lookup must prune to the one file its range covers")

    // unknown transforms refuse loudly
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db.badp (k BIGINT) USING graft " +
        "PARTITIONED BY (truncate(4, k))")
    }
    assert(e.getMessage.contains("transform"))
  }

  test("atomic CTAS and CREATE OR REPLACE TABLE AS SELECT: staged " +
      "write, commit installs, failure leaves the old table intact") {
    warehouse
    spark.range(0, 50).selectExpr("id AS k", "CAST(id * 2 AS DOUBLE) AS v")
      .createOrReplaceTempView("ctas2_src")
    // plain CTAS through the staging path
    spark.sql("CREATE TABLE gcat.db.ctas2 USING graft " +
      "TBLPROPERTIES('index'='k') AS SELECT * FROM ctas2_src")
    assert(spark.table("gcat.db.ctas2").count() == 50)
    // REPLACE swaps wholesale — new content, new schema allowed
    spark.sql("CREATE OR REPLACE TABLE gcat.db.ctas2 USING graft " +
      "TBLPROPERTIES('index'='k') " +
      "AS SELECT k, v * 10 AS v FROM ctas2_src WHERE k < 20")
    val got = spark.table("gcat.db.ctas2").orderBy("k").collect()
    assert(got.length == 20)
    assert(got(3).getDouble(1) == 30.0 * 2)
    // REPLACE TABLE (no OR CREATE) on a missing table refuses
    intercept[Exception] {
      spark.sql("REPLACE TABLE gcat.db.nope USING graft " +
        "TBLPROPERTIES('index'='k') AS SELECT * FROM ctas2_src")
    }
    // a FAILING replace leaves the existing table untouched
    intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE gcat.db.ctas2 USING graft " +
        "TBLPROPERTIES('index'='k') " +
        "AS SELECT k, assert_true(k < 5) AS v FROM ctas2_src")
    }
    assert(spark.table("gcat.db.ctas2").count() == 20,
      "failed staged replace must leave the previous table")
    // no staged debris is listed as a table
    assert(!spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getString(1)).exists(_.startsWith(".")))
  }

  test("zero-config catalog: no warehouse option needed — names map " +
      "under the session warehouse, path identifiers just work") {
    spark.conf.set("spark.sql.catalog.gzero",
      classOf[graft.sources.GraftCatalog].getName)
    // name-based table lands under spark.sql.warehouse.dir/gzero
    spark.sql("CREATE TABLE gzero.zt USING graft " +
      "TBLPROPERTIES('index'='k') AS " +
      "SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(0, 30)")
    assert(spark.table("gzero.zt").count() == 30L)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(graft.core.Sidecar.exists(spark,
      wh.stripSuffix("/") + "/gzero/zt"))
    // path identifier through the same zero-config catalog
    val dir = Fixtures.tempDir("graft-zeroconf") + "/ds"
    PDataset.fromDataFrame(
      spark.range(0, 40).selectExpr("id AS k", "id * 2.0 AS v"),
      Seq("k")).writeParquet(dir)
    assert(spark.sql(s"SELECT count(*) AS n FROM gzero.`$dir`")
      .head.getLong(0) == 40L)
    spark.sql(s"DELETE FROM gzero.`$dir` WHERE k < 10")
    assert(spark.sql(s"SELECT count(*) AS n FROM gzero.`$dir`")
      .head.getLong(0) == 30L)
    spark.sql("DROP TABLE gzero.zt")
  }

  test("CREATE TABLE OPTIONS are honored, not dropped: bloom/stats " +
      "sidecars build on insert, constraints guard from row one, " +
      "unknown options refuse") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.opts (k BIGINT, tag STRING, " +
      "v DOUBLE) USING graft TBLPROPERTIES('index'='k') " +
      "OPTIONS (bloom 'tag', stats 'v', `constraint.v_pos` 'v >= 0')")
    val dir = s"$warehouse/db/opts"
    // the constraint is recorded at CREATE (empty table) and guards
    // the very first insert up front
    assert(graft.operators.Constraints.list(spark, dir) ==
      Map("v_pos" -> "v >= 0"))
    intercept[Exception] {
      spark.sql("INSERT INTO gcat.db.opts " +
        "SELECT id, CONCAT('t', id), CAST(id AS DOUBLE) - 5 " +
        "FROM range(0, 10)")
    }
    assert(spark.table("gcat.db.opts").count() == 0,
      "a violating first insert must not land")
    // a clean insert lands AND builds the declared bloom + colstats
    // sidecars — the options were persisted, not dropped
    spark.sql("INSERT INTO gcat.db.opts " +
      "SELECT id, CONCAT('t', id), CAST(id AS DOUBLE) FROM range(0, 50)")
    assert(spark.table("gcat.db.opts").count() == 50)
    val (fs, destP) = graft.core.GraftFs.resolve(spark, dir)
    assert(fs.exists(new org.apache.hadoop.fs.Path(destP,
      graft.core.BloomIndex.BloomFile)),
      "OPTION bloom must build the _graft_bloom sidecar on insert")
    assert(fs.exists(new org.apache.hadoop.fs.Path(destP,
      graft.core.ColumnStats.FileName)),
      "OPTION stats must build the _graft_colstats sidecar on insert")
    // unknown OPTIONS refuse loudly at CREATE — nothing silent
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db.badopt (k BIGINT) USING graft " +
        "TBLPROPERTIES('index'='k') OPTIONS (compression 'lz4')")
    }
    assert(messagesOf(e).mkString.contains("unsupported OPTION"),
      messagesOf(e).mkString("\n"))
    // a bad bloom column refuses at CREATE, not at first insert
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db.badopt2 (k BIGINT, v DOUBLE) " +
        "USING graft TBLPROPERTIES('index'='k') OPTIONS (bloom 'v')")
    }
    assert(messagesOf(e2).mkString.contains("bloom"),
      messagesOf(e2).mkString("\n"))
  }

  test("ALTER TABLE RENAME COLUMN is metadata-only: old files " +
      "readable under new names, inserts and row-level SQL follow") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.ren (k BIGINT, tag STRING, " +
      "v DOUBLE) USING graft TBLPROPERTIES('index'='k') " +
      "OPTIONS (bloom 'tag', stats 'v')")
    spark.sql("INSERT INTO gcat.db.ren " +
      "SELECT id, CONCAT('t', id), CAST(id AS DOUBLE) FROM range(0, 50)")
    val dir = s"$warehouse/db/ren"
    val filesBefore = graft.core.Sidecar.load(spark, dir).files.toSet

    spark.sql("ALTER TABLE gcat.db.ren RENAME COLUMN v TO value")
    spark.sql("ALTER TABLE gcat.db.ren RENAME COLUMN k TO key") // index
    assert(graft.core.Sidecar.load(spark, dir).files.toSet == filesBefore,
      "rename must rewrite zero data files")

    // old files read correctly under the new names, with pruning
    assert(spark.sql("SELECT sum(value) AS s FROM gcat.db.ren " +
      "WHERE key < 10").head.getDouble(0) == 45.0)
    assert(spark.table("gcat.db.ren").columns.toSeq ==
      Seq("key", "tag", "value"))
    // a bloom lookup on the untouched column still serves
    assert(spark.sql("SELECT count(*) AS n FROM gcat.db.ren " +
      "WHERE tag = 't7'").head.getLong(0) == 1L)

    // inserts under the new names land beside the old files (the sink
    // maps logical to physical; the stats sidecar updates on 'value')
    spark.sql("INSERT INTO gcat.db.ren " +
      "SELECT id, CONCAT('t', id), CAST(id AS DOUBLE) " +
      "FROM range(50, 80)")
    assert(spark.table("gcat.db.ren").count() == 80)
    assert(spark.sql("SELECT value FROM gcat.db.ren WHERE key = 70")
      .head.getDouble(0) == 70.0)

    // row-level SQL under the renamed schema
    spark.sql("UPDATE gcat.db.ren SET value = -1 WHERE key < 3")
    assert(spark.sql("SELECT sum(value) AS s FROM gcat.db.ren " +
      "WHERE key < 3").head.getDouble(0) == -3.0)
    spark.sql("DELETE FROM gcat.db.ren WHERE key >= 78")
    assert(spark.table("gcat.db.ren").count() == 78)

    // renaming a constraint-referenced column refuses loudly
    spark.sql("CREATE TABLE gcat.db.ren2 (k BIGINT, v DOUBLE) " +
      "USING graft TBLPROPERTIES('index'='k') " +
      "OPTIONS (`constraint.pos` 'v >= 0')")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.db.ren2 RENAME COLUMN v TO w")
    }
    assert(messagesOf(e).mkString.toLowerCase.contains("constraint"),
      messagesOf(e).mkString("\n"))
  }

  test("ALTER COLUMN TYPE widens metadata-only: old files readable " +
      "as the wider type, bounds re-typed, narrowing refuses") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.widen (k INT, v FLOAT, " +
      "price DECIMAL(7,2), tag STRING) USING graft " +
      "TBLPROPERTIES('index'='k')")
    (0 until 200 by 50).foreach { lo => // 4 appends -> 4 files
      spark.sql("INSERT INTO gcat.db.widen " +
        "SELECT CAST(id AS INT), CAST(id AS FLOAT), " +
        s"CAST(id AS DECIMAL(7,2)), CONCAT('t', id) " +
        s"FROM range($lo, ${lo + 50})")
    }
    val dir = s"$warehouse/db/widen"
    val filesBefore = graft.core.Sidecar.load(spark, dir).files.toSet

    spark.sql("ALTER TABLE gcat.db.widen ALTER COLUMN k TYPE BIGINT")
    spark.sql("ALTER TABLE gcat.db.widen ALTER COLUMN v TYPE DOUBLE")
    spark.sql(
      "ALTER TABLE gcat.db.widen ALTER COLUMN price TYPE DECIMAL(12,2)")
    val m = graft.core.Sidecar.load(spark, dir)
    assert(m.files.toSet == filesBefore,
      "widening must rewrite zero data files")
    assert(m.schema.fields.map(f => f.name -> f.dataType.simpleString)
      .toMap == Map("k" -> "bigint", "v" -> "double",
        "price" -> "decimal(12,2)", "tag" -> "string"))
    // index bounds re-typed with the column: a Long probe against a
    // stale Int bound would miscompare in routing and pruning
    assert(m.lowerBounds.forall(_.forall(
      _.forall(_.isInstanceOf[java.lang.Long]))),
      s"bounds must re-type to Long, got ${m.lowerBounds.head}")

    // old (int32/float/decimal(7,2)) files read as the wider type
    val row = spark.sql("SELECT k, v, price FROM gcat.db.widen " +
      "WHERE k = 7").head
    assert(row.getLong(0) == 7L && row.getDouble(1) == 7.0 &&
      row.getDecimal(2).compareTo(new java.math.BigDecimal("7.00")) == 0)
    // pruning still fires on the widened index column
    assert(v2ScannedFiles(spark.sql(
      "SELECT k FROM gcat.db.widen WHERE k = 7")) <
      filesBefore.size)

    // values only the wider type can hold land beside the old files
    spark.sql("INSERT INTO gcat.db.widen VALUES " +
      "(5000000000, 1e300, 9999999999.99, 'big')")
    val big = spark.sql("SELECT k, v, price FROM gcat.db.widen " +
      "WHERE k = 5000000000").head
    assert(big.getLong(0) == 5000000000L && big.getDouble(1) == 1e300)
    assert(spark.table("gcat.db.widen").count() == 201)
    // keyed maintenance still routes across mixed-width files
    spark.sql("UPDATE gcat.db.widen SET tag = 'U' WHERE k = 7")
    assert(spark.sql("SELECT tag FROM gcat.db.widen WHERE k = 7")
      .head.getString(0) == "U")

    // a NARROWING refuses loudly (Spark's analyzer catches the
    // downcast before the catalog; either refusal leaves metadata
    // untouched), and an up-CAST that is not a parquet-level WIDENING
    // (bigint -> decimal would need a physical rewrite) hits OUR gate
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.db.widen ALTER COLUMN k TYPE INT")
    }
    assert(messagesOf(e).mkString.contains("NOT_SUPPORTED_CHANGE_COLUMN"),
      messagesOf(e).mkString("\n"))
    val e2 = intercept[Exception] {
      spark.sql(
        "ALTER TABLE gcat.db.widen ALTER COLUMN k TYPE DECIMAL(20,0)")
    }
    assert(messagesOf(e2).mkString.contains("WIDENINGS"),
      messagesOf(e2).mkString("\n"))
    // the programmatic path refuses a narrowing itself (no analyzer
    // in front of it)
    val e3 = intercept[IllegalArgumentException] {
      graft.operators.Maintenance.widenColumns(spark, dir,
        "price" -> org.apache.spark.sql.types.DecimalType(8, 4))
    }
    assert(e3.getMessage.contains("WIDENINGS"), e3.getMessage)
    assert(graft.core.Sidecar.load(spark, dir).schema("k")
      .dataType.simpleString == "bigint")
  }

  test("TBLPROPERTIES('graft.retain'='true') pins retained row-level " +
      "SQL on the table — change streams survive any writer's conf") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.retained (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES('index'='k', 'graft.retain'='true')")
    val dir = s"$warehouse/db/retained"
    spark.sql("INSERT INTO gcat.db.retained " +
      "SELECT id, CONCAT('v', id) FROM range(0, 40)")
    // a writer session that never set spark.graft.sql.retain
    assert(spark.conf.getOption("spark.graft.sql.retain")
      .forall(!_.equalsIgnoreCase("true")))
    spark.sql("UPDATE gcat.db.retained SET v = 'U' WHERE k = 7")
    // the outgoing generation was archived: the change feed crosses
    // the UPDATE instead of dying on an unretained commit
    assert(graft.operators.Maintenance.versions(spark, dir).nonEmpty,
      "the table property must retain the replaced generation")
    val feed = graft.operators.Maintenance.changes(spark, dir, 0)
      .select("k", "v", "change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(feed == Set((7L, "v7", "update_preimage"),
      (7L, "U", "update_postimage")), feed.toString)
    // a table WITHOUT the property keeps the fast unretained default
    spark.sql("CREATE TABLE gcat.db.unretained (k BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES('index'='k')")
    spark.sql("INSERT INTO gcat.db.unretained " +
      "SELECT id, CONCAT('v', id) FROM range(0, 40)")
    spark.sql("UPDATE gcat.db.unretained SET v = 'U' WHERE k = 7")
    assert(graft.operators.Maintenance.versions(spark,
      s"$warehouse/db/unretained").isEmpty)
    // a bad value refuses at CREATE
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db.badretain (k BIGINT) USING " +
        "graft TBLPROPERTIES('index'='k', 'graft.retain'='maybe')")
    }
    assert(messagesOf(e).mkString.contains("graft.retain"),
      messagesOf(e).mkString("\n"))
  }

  private def messagesOf(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .flatMap(e => Option(e.getMessage)).toSeq

  test("a staged replace that loses the destination race preserves " +
      "the replaced table and names the copy") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.race USING graft " +
      "TBLPROPERTIES('index'='k') AS " +
      "SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(0, 30)")
    val dir = s"$warehouse/db/race"
    val (fs, destP) = graft.core.GraftFs.resolve(spark, dir)
    // a concurrent writer recreates the destination with its own
    // content inside the move-aside → install window
    graft.sources.GraftStagedTable.betweenRenames = () => {
      fs.mkdirs(destP)
      graft.core.GraftFs.writeString(fs,
        new org.apache.hadoop.fs.Path(destP, "foreign.txt"), "winner")
    }
    try {
      val e = intercept[Exception] {
        spark.sql("CREATE OR REPLACE TABLE gcat.db.race USING graft " +
          "TBLPROPERTIES('index'='k') AS " +
          "SELECT id AS k, CAST(id * 2 AS DOUBLE) AS v FROM range(0, 5)")
      }
      val msg = messagesOf(e).mkString("\n")
      assert(msg.contains("lost a race"), msg)
      assert(msg.contains(".replaced-race"),
        s"the rollback must name the preserved copy: $msg")
      // the move-aside copy still holds the full original table
      val trash = fs.listStatus(destP.getParent).map(_.getPath)
        .filter(_.getName.startsWith(".replaced-race"))
      assert(trash.length == 1, trash.mkString(", "))
      assert(PDataset.scanParquet(spark, trash(0).toString)
        .toDF.count() == 30,
        "the preserved copy must be the complete pre-replace table")
      // our staged copy was withdrawn from the squatted destination
      assert(!fs.listStatus(destP)
        .exists(_.getPath.getName.startsWith(".staging")),
        "the nested staged copy must be withdrawn")
      fs.delete(destP, true); trash.foreach(fs.delete(_, true))
      spark.sql("DROP TABLE IF EXISTS gcat.db.race")
    } finally
      graft.sources.GraftStagedTable.betweenRenames = () => ()
  }

  test("empty-dir debris appearing mid-commit does not derail the " +
      "install: POSIX rename replaces an empty directory atomically") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.race2 USING graft " +
      "TBLPROPERTIES('index'='k') AS " +
      "SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(0, 30)")
    val dir = s"$warehouse/db/race2"
    val (fs, destP) = graft.core.GraftFs.resolve(spark, dir)
    graft.sources.GraftStagedTable.betweenRenames =
      () => { fs.mkdirs(destP); () }
    try {
      spark.sql("CREATE OR REPLACE TABLE gcat.db.race2 USING graft " +
        "TBLPROPERTIES('index'='k') AS " +
        "SELECT id AS k, CAST(id * 2 AS DOUBLE) AS v FROM range(0, 5)")
      // the replace won: new content installed, no nesting, no
      // move-aside debris left behind
      val got = spark.table("gcat.db.race2").orderBy("k").collect()
      assert(got.length == 5)
      assert(got(3).getDouble(1) == 6.0)
      assert(!fs.listStatus(destP.getParent)
        .exists(_.getPath.getName.startsWith(".replaced-race2")))
      assert(!fs.listStatus(destP)
        .exists(_.getPath.getName.startsWith(".staging")))
    } finally
      graft.sources.GraftStagedTable.betweenRenames = () => ()
  }
}
