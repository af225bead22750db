package graft

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.PDataset
import graft.functions.TextFunctions
import graft.operators.{Dedup, Events, Multimodal, Similarity}

/** Driver contract — the declared operator surface with DuckDB oracles.
  *
  * Conventions that keep the hash-compare deterministic across engines:
  * every query ends in an ORDER BY over a unique key (ties broken
  * explicitly), double aggregates are rounded, and the oracle SQL casts
  * result dtypes to match Spark's (year/length/size -> INT, integer
  * sums -> BIGINT since DuckDB widens to HUGEINT).
  */
object SparkEntry {

  private def T(sfDir: String, t: String) = s"$sfDir/$t.parquet"
  private def scan(s: SparkSession, sfDir: String, t: String): PDataset =
    PDataset.scanParquet(s, T(sfDir, t))

  /** The events table's `ts` encoding has varied across generator
    * versions: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — read as long via the legacy conf and truncate)
    * vs native TIMESTAMP(MICROS). Adapt to whichever the file
    * declares; either way the query sees a microsecond NTZ timestamp
    * (matching what engines with native us-timestamps see). */
  private def eventsDF(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(T(d, "events"))
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts", ts)
  }
  private def ldt(s: String): LocalDateTime = LocalDateTime.parse(s)
  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("out").toString

  /** Orders with a derived clustered column `o_v = o_orderkey * 3`,
    * column stats on (o_v, o_totalprice) — shared by q_colstats and
    * q_metadata_minmax. */
  private def colstatsFixture(s: SparkSession, d: String): String =
    fixture("colstats", d) { out =>
      val ord = s.read.parquet(T(d, "orders"))
        .withColumn("o_v", col("o_orderkey") * 3)
      val ds = PDataset.fromDataFrame(ord, Seq("o_orderkey"))
      ds.repartition(math.max(1000L, ds.sizes.get.sum / 24))
        .writeParquet(out)
      graft.core.ColumnStats.build(s, out, Seq("o_v", "o_totalprice"))
    }

  /** Build-once fixture directory, keyed by (name, sf dir): the bench
    * times each query several times in one process, and rebuilding a
    * persisted input on every run measured fixture construction, not
    * the operator (q_join_division spent >2/3 of its time rebuilding
    * its two inputs). The builder runs at most once per process; the
    * query result is identical either way. */
  private val fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private def fixture(name: String, d: String)(
      build: String => Unit): String =
    fixtures.computeIfAbsent(s"$name|$d", _ => {
      val dir = tmp(s"graft-fix-$name")
      build(dir)
      dir
    })

  /** A fresh mutable COPY of a build-once fixture: the maintenance
    * queries mutate their dataset in place, so each run gets its own
    * copy via a driver-side file walk (a few MB of local I/O) instead
    * of a full Spark rebuild. */
  private def mutableCopy(name: String, d: String)(
      build: String => Unit): String = {
    val src = fixture(name, d)(build)
    val dst = java.nio.file.Files
      .createTempDirectory(s"graft-mut-$name").resolve("out")
    val s0 = java.nio.file.Paths.get(src)
    val walk = java.nio.file.Files.walk(s0)
    try walk.forEach { p =>
      val t = dst.resolve(s0.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else {
        java.nio.file.Files.createDirectories(t.getParent)
        java.nio.file.Files.copy(p, t)
      }
    } finally walk.close()
    dst.toString
  }

  /** Mutable catalog-table copy of a build-once fixture: ONE
    * GraftCatalog named `gmut` is registered per process against a
    * stable warehouse (CatalogManager caches instances by name, so a
    * per-run catalog would leak an instance per bench run); each call
    * copies the fixture into the warehouse under a fresh TABLE name —
    * name resolution is a pure warehouse-directory mapping, so unique
    * names cost nothing. Returns the qualified `gmut.<table>` name. */
  private lazy val mutWarehouse: String = {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-mutwh").toString
    val s = org.apache.spark.sql.SparkSession.active
    s.conf.set("spark.sql.catalog.gmut", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.gmut.warehouse", wh)
    wh
  }
  private def mutableCatalogTable(
      s: SparkSession, name: String, d: String)(
      build: String => Unit): String = {
    val src = fixture(name, d)(build)
    s.conf.set("spark.sql.catalog.gmut", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.gmut.warehouse", mutWarehouse)
    val tname = name + java.util.UUID.randomUUID().toString
      .replace("-", "").take(12)
    val dst = java.nio.file.Paths.get(mutWarehouse, tname)
    val s0 = java.nio.file.Paths.get(src)
    val walk = java.nio.file.Files.walk(s0)
    try walk.forEach { p =>
      val t = dst.resolve(s0.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else {
        java.nio.file.Files.createDirectories(t.getParent)
        java.nio.file.Files.copy(p, t)
      }
    } finally walk.close()
    s"gmut.$tname"
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the M1
    * end-to-end slice — scan, reindex, range-repartition, pruned slice. */
  def entry(spark: SparkSession): DataFrame = {
    val li = scan(spark, "/root/testdata/sf0.001", "lineitem")
      .reindex(Seq("l_shipdate"))
    li.repartition(1000)
      .slice(Vector(Some(ldt("1996-01-01T00:00"))),
        Vector(Some(ldt("1998-01-01T00:00"))))
      .toDF
  }

  /** The maintenance queries' shared pristine input: orders indexed on
    * o_orderkey in ~20 files (each run mutates its own [[mutableCopy]]). */
  private def ordersByKey20(
      s: SparkSession, d: String): String => Unit = out => {
    val ds = scan(s, d, "orders").reindex(Seq("o_orderkey"))
    ds.repartition(math.max(50L, ds.sizes.get.sum / 20)).writeParquet(out)
  }

  /** ~24-division orders/customer pair co-clustered on the customer
    * key — the shared input of the division-join queries (enough
    * divisions to clear the parallelism gate at any SF). */
  private def jdOrdersFixture(s: SparkSession, d: String): String =
    fixture("jd-orders", d) { out =>
      val o0 = scan(s, d, "orders").rename(Map("o_custkey" -> "ckey"))
        .reindex(Seq("ckey"))
      o0.repartition(math.max(1L, o0.sizes.get.sum / 24))
        .writeParquet(out)
    }
  private def jdCustomerFixture(s: SparkSession, d: String): String =
    fixture("jd-customer", d) { out =>
      val c0 = scan(s, d, "customer").rename(Map("c_custkey" -> "ckey"))
        .reindex(Seq("ckey"))
      c0.repartition(math.max(1L, c0.sizes.get.sum / 24))
        .writeParquet(out)
    }

  /** Bucket-clustered orders (leading index column `bucket` constant
    * per file, o_custkey column stats) — the metadata-only
    * grouped/filtered aggregate fixtures. */
  private def bucketedOrdersFixture(s: SparkSession, d: String): String =
    fixture("metagroupby", d) { out =>
      val orders = s.read.parquet(T(d, "orders")).select(
        (col("o_orderkey") % 4).as("bucket"),
        col("o_orderkey"), col("o_custkey"))
      val parts = (0 until 4).map(b => PDataset.fromDataFrame(
        orders.filter(col("bucket") === b), Seq("bucket", "o_orderkey")))
      PDataset.concat(parts).writeParquet(out)
      graft.core.ColumnStats.build(s, out, Seq("o_custkey"))
    }

  /** Build-once two-generation history fixture (orders indexed on
    * o_orderkey, then one retained upsert: %701 keys updated, %997
    * keys re-inserted under +1e9 ids) — the shared input of the batch
    * change-feed query and its streaming twin. */
  private def ordersFeedFixture(s: SparkSession, d: String): String =
    fixture("ordkey20feed", d) { out =>
      ordersByKey20(s, d)(out)
      val orders = s.read.parquet(T(d, "orders"))
      val upd = orders.filter(col("o_orderkey") % 701 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val ins = orders.filter(col("o_orderkey") % 997 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
        .withColumn("o_orderpriority", lit("NEW"))
      graft.operators.Maintenance.upsert(
        s, out, upd.unionByName(ins), retain = true)
    }

  /** Build-once three-generation history (pristine → +%997 inserts
    * retained → -%401 deletes retained) — shared by the history
    * ledger query and the per-commit CDF query. */
  private def ordersHist3Fixture(s: SparkSession, d: String): String =
    fixture("ordkey20hist3", d) { out =>
      ordersByKey20(s, d)(out)
      val orders = s.read.parquet(T(d, "orders"))
      val ins = orders.filter(col("o_orderkey") % 997 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
      graft.operators.Maintenance.upsert(s, out, ins, retain = true)
      val dels = orders
        .filter(col("o_orderkey") % 401 === 0 && col("o_orderkey") =!= 0)
        .select("o_orderkey")
      graft.operators.Maintenance.deleteKeys(s, out, dels, retain = true)
    }

  /** Orders (key, custkey, derived integral o_qty) indexed on
    * o_orderkey in ~20 files — the builder behind [[ordQtySrc]] and
    * the incremental-view query's mutable copy. */
  private def ordersQty20(s: SparkSession, d: String): String => Unit =
    out => {
      val df = s.read.parquet(T(d, "orders"))
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_orderkey") % 50).cast("double").as("o_qty"))
      val ds = PDataset.fromDataFrame(df, Seq("o_orderkey"))
      ds.repartition(math.max(50L, ds.sizes.get.sum / 20))
        .writeParquet(out)
    }

  /** Build-once graft dataset off [[ordersQty20]] — shared by the
    * view-rewrite and metadata-count queries. */
  private def ordQtySrc(s: SparkSession, d: String): String =
    fixture("ordqtysrc", d)(ordersQty20(s, d))

  // ---- shared query fragments ----

  /** Deterministic total order: sort by every column. The synthetic
    * lineitem key (l_orderkey, l_linenumber) is NOT unique, so partial
    * sort keys leave tie order engine-dependent. */
  private def lineitemOrdered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(col).toSeq: _*)

  private val lineitemOrderSql = "ORDER BY ALL"

  /** The planted duplicated passage for the ExactSubstr queries: 12
    * tokens, appended to every doc_id % 7 == 0 document (oracle
    * inlines the same literal). */
  private val SpanPassage =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"

  private def spanPlantedDocs(s: SparkSession, d: String): DataFrame =
    scan(s, d, "documents").toDF.select(col("doc_id"),
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" " + SpanPassage)))
        .otherwise(col("text")).as("text"))

  /** Within-doc fixture: the same passage twice with an interlude. */
  private def spanSelfPlantedDocs(s: SparkSession, d: String): DataFrame =
    scan(s, d, "documents").toDF.select(col("doc_id"),
      when(col("doc_id") % 11 === 0,
        concat(col("text"),
          lit(" " + SpanPassage + " interlude " + SpanPassage)))
        .otherwise(col("text")).as("text"))

  /** Composed fixture: %11 docs self-repeat the passage, (other) %7
    * docs carry one cross-doc copy — both dedup passes have work. */
  private def spanBothPlantedDocs(s: SparkSession, d: String): DataFrame =
    scan(s, d, "documents").toDF.select(col("doc_id"),
      when(col("doc_id") % 11 === 0,
        concat(col("text"),
          lit(" " + SpanPassage + " interlude " + SpanPassage)))
        .when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" " + SpanPassage)))
        .otherwise(col("text")).as("text"))

  private def statsRow(s: SparkSession, ds: PDataset): DataFrame = {
    val n = ds.sizes.get.sum
    val lb = ds.lowerBounds.get.map(_.head).min(graft.core.Lex.boundOrdering
      .on[Option[Any]](v => Vector(v))).orNull
    val ub = ds.upperBounds.get.map(_.head).max(graft.core.Lex.boundOrdering
      .on[Option[Any]](v => Vector(v))).orNull
    val schema = StructType(Seq(
      StructField("n_rows", LongType),
      StructField("lb", TimestampNTZType),
      StructField("ub", TimestampNTZType)))
    s.createDataFrame(java.util.Arrays.asList(Row(n, lb, ub)), schema)
  }

  /** recall@5 of an approximate top-k result vs its exact baseline,
    * thresholded to one (n_queries, recall_floor_met) row — the same
    * scale-robust contract shape as q_sketch_hll. A literal recall
    * value would be scale-factor-specific (bucket occupancy changes
    * with corpus size); the floor holds at every verification SF. */
  private def recallContract(
      approx: DataFrame, brute: DataFrame, floor: Double): DataFrame = {
    val hits = brute.select("query_id", "neighbor_id")
      .join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    brute.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(coalesce(col("hits"), lit(0L)).as("hits"))
      .agg(count(lit(1)).as("n_queries"),
        (avg(col("hits").cast("double") / 5.0) >= lit(floor))
          .as("recall_floor_met"))
  }

  // ---- query inventory ----

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- core engine: scan / stats / slice / repartition / collate --
    "q_scan_collect" -> ((s, d) =>
      lineitemOrdered(scan(s, d, "lineitem").toDF)),

    "q_reindex_stats" -> ((s, d) =>
      statsRow(s, scan(s, d, "lineitem").reindex(Seq("l_shipdate")))),

    "q_slice" -> ((s, d) => {
      val ds = scan(s, d, "lineitem").reindex(Seq("l_shipdate"))
      val rows = math.max(1000L, ds.sizes.get.sum / 8)
      lineitemOrdered(
        ds.repartition(rows)
          .slice(Vector(Some(ldt("1996-01-01T00:00"))),
            Vector(Some(ldt("1998-01-01T00:00"))))
          .toDF)
    }),

    "q_slice_inclusive" -> ((s, d) => {
      val ds = scan(s, d, "lineitem").reindex(Seq("l_shipdate"))
      lineitemOrdered(
        ds.slice(Vector(Some(ldt("1996-06-01T00:00"))),
          Vector(Some(ldt("1997-06-01T00:00"))), inclusive = "both").toDF)
    }),

    "q_repartition_roundtrip" -> ((s, d) => {
      val ds = scan(s, d, "lineitem").reindex(Seq("l_shipdate"))
      val rows = math.max(1000L, ds.sizes.get.sum / 8)
      lineitemOrdered(ds.repartition(rows).assertDisjoint().toDF)
    }),

    "q_rowmode_repartition" -> ((s, d) => {
      val ds = scan(s, d, "lineitem").reindex(Seq.empty)
      val rows = math.max(1000L, ds.sizes.get.sum / 6)
      lineitemOrdered(ds.repartition(rows).toDF)
    }),

    "q_collate" -> ((s, d) => {
      val ds = scan(s, d, "lineitem").reindex(Seq("l_shipdate"))
      val rows = math.max(500L, ds.sizes.get.sum / 16)
      lineitemOrdered(ds.repartition(rows).collate(rows * 4).toDF)
    }),

    "q_concat" -> ((s, d) => {
      val r = scan(s, d, "region")
      PDataset.concat(Seq(r, r)).toDF.orderBy("r_regionkey", "r_name")
    }),

    "q_rename" -> ((s, d) =>
      scan(s, d, "nation")
        .rename(Map("n_nationkey" -> "nationkey", "n_name" -> "name",
          "n_regionkey" -> "regionkey"))
        .toDF.orderBy("nationkey")),

    // revenue left unrounded on purpose: x*(1-d) is the same two IEEE
    // ops in any engine (bit-identical), while round() at .5-boundary
    // representations is not.
    "q_map_partition" -> ((s, d) =>
      scan(s, d, "lineitem")
        .mapPartitionsP(df =>
          df.filter(col("l_quantity") >= 25)
            .withColumn("revenue",
              col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .toDF.select("l_orderkey", "l_linenumber", "revenue")
        .orderBy("l_orderkey", "l_linenumber", "revenue")),

    "q_from_dataframe" -> ((s, d) =>
      statsRow(s, PDataset.fromDataFrame(
        s.read.parquet(T(d, "orders")), Seq("o_orderdate")))),

    "q_write_roundtrip" -> ((s, d) => {
      val ds = scan(s, d, "orders").reindex(Seq("o_orderdate"))
      val rows = math.max(200L, ds.sizes.get.sum / 4)
      val back = ds.repartition(rows).writeParquet(tmp("graft-q-write"))
      back.toDF.orderBy("o_orderkey")
    }),

    "q_write_metadata" -> ((s, d) => {
      val dir = tmp("graft-q-meta")
      s.read.parquet(T(d, "orders")).repartition(4)
        .write.parquet(dir)
      PDataset.writeMetadata(s, dir, Seq("o_orderdate"))
      statsRow(s, PDataset.scanParquet(s, dir))
    }),

    // SQL-surface access: the engine's written format opened through
    // the registered `graft` short name — sidecar-served listing +
    // plan-time file pruning for plain spark.read/SQL users.
    "q_graft_source" -> ((s, d) => {
      val dir = fixture("src", d) { out =>
        val ds = scan(s, d, "orders").reindex(Seq("o_orderdate"))
        ds.repartition(math.max(200L, ds.sizes.get.sum / 4))
          .writeParquet(out)
      }
      s.read.format("graft").load(dir)
        .filter(col("o_orderdate") >= lit(ldt("1996-01-01T00:00")))
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // ORC source through the same per-file partition machinery as
    // parquet/CSV/JSON: typed scan, stats, pruned slice.
    "q_scan_orc" -> ((s, d) => {
      val dir = fixture("orc", d) { out =>
        s.read.parquet(T(d, "orders")).repartition(4)
          .write.mode("overwrite").orc(out)
      }
      PDataset.scanOrc(s, dir).reindex(Seq("o_orderkey"))
        .slice(Vector(Some(1000L)), Vector(Some(5000L)))
        .toDF.orderBy("o_orderkey")
    }),

    // -- in-place table maintenance (compact / delete / upsert) --
    // Each writes a many-small-files dataset, runs the maintenance op
    // in place, and reads the result back; the answer is
    // layout-independent, so plain SQL over the source table is the
    // oracle. The point of the ops is WHAT THEY DON'T TOUCH:
    // compaction reads only sub-target files, deleteRange drops
    // fully-covered files without reading them and rewrites at most
    // the two boundary files, upsert rewrites only the partitions its
    // keys route to (MaintenanceSpec pins those file-level contracts).
    "q_compact" -> ((s, d) => {
      val dir = mutableCopy("ordkey40", d) { out =>
        val ds = scan(s, d, "orders").reindex(Seq("o_orderkey"))
        ds.repartition(math.max(50L, ds.sizes.get.sum / 40))
          .writeParquet(out)
      }
      val rows =
        math.max(50L, PDataset.scanParquet(s, dir).sizes.get.sum / 40)
      graft.operators.Maintenance.compact(s, dir, targetRows = rows * 8)
      PDataset.scanParquet(s, dir).toDF.orderBy("o_orderkey")
    }),

    // Layout maintenance for continuously appended tables: each
    // append lands files whose key ranges overlap everything already
    // there, so range pruning (slices, division joins/aggs, index
    // bucket joins) degrades toward full scans. recluster re-sorts
    // the live rows into disjoint files in ONE ranged shuffle and one
    // atomic metadata swap — riding the replaceWhere commit path, so
    // constraints, txn ledgers, history and CDF all survive.
    "q_recluster" -> ((s, d) => {
      val dir = mutableCopy("ordoverlap", d) { out =>
        val o = s.read.parquet(T(d, "orders"))
        PDataset.fromDataFrame(
          o.filter(col("o_orderkey") % 2 === 0), Seq("o_orderkey"))
          .writeParquet(out)
        PDataset.fromDataFrame(
          o.filter(col("o_orderkey") % 2 === 1), Seq("o_orderkey"))
          .writeParquet(out, append = true)
      }
      require(!PDataset.scanParquet(s, dir).isDisjoint,
        "fixture must start overlapping")
      graft.operators.Maintenance.recluster(s, dir)
      val ds = PDataset.scanParquet(s, dir)
      ds.assertDisjoint()
      ds.toDF.orderBy("o_orderkey")
    }),

    "q_delete_range" -> ((s, d) => {
      val dir = mutableCopy("ordkey20", d)(ordersByKey20(s, d))
      graft.operators.Maintenance.deleteRange(s, dir,
        lb = Vector(Some(1000L)), ub = Vector(Some(5000L)),
        inclusive = "lower")
      PDataset.scanParquet(s, dir).toDF.orderBy("o_orderkey")
    }),

    // Point-delete by key: scattered erasure keys rewrite only the
    // files they route to (emptied files drop from the sidecar).
    "q_delete_keys" -> ((s, d) => {
      val dir = mutableCopy("ordkey20", d)(ordersByKey20(s, d))
      val keys = s.read.parquet(T(d, "orders"))
        .filter(col("o_orderkey") % 401 === 0).select("o_orderkey")
      graft.operators.Maintenance.deleteKeys(s, dir, keys)
      PDataset.scanParquet(s, dir).toDF.orderBy("o_orderkey")
    }),

    // CDC-apply in one commit: replace/insert + point-delete with a
    // single sidecar swap (each affected partition rewritten once).
    "q_merge" -> ((s, d) => {
      val dir = mutableCopy("ordkey20", d)(ordersByKey20(s, d))
      val orders = s.read.parquet(T(d, "orders"))
      val delPred =
        col("o_orderkey") % 997 === 0 && col("o_orderkey") =!= 0
      // merge rejects a key on both sides; keys divisible by both 701
      // and 997 exist at SF >= 1 (lcm 698897), so the update side
      // excludes the delete set — the oracle is unaffected because
      // every excluded key is deleted from the output anyway.
      val upd = orders.filter(col("o_orderkey") % 701 === 0 && !delPred)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val dels = orders.filter(delPred)
        .select("o_orderkey")
      graft.operators.Maintenance.merge(s, dir, upd, dels)
      PDataset.scanParquet(s, dir).toDF.orderBy("o_orderkey")
    }),

    "q_upsert" -> ((s, d) => {
      val dir = mutableCopy("ordkey20", d)(ordersByKey20(s, d))
      val orders = s.read.parquet(T(d, "orders"))
      val upd = orders.filter(col("o_orderkey") % 701 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val ins = orders.filter(col("o_orderkey") % 997 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
        .withColumn("o_orderpriority", lit("NEW"))
      graft.operators.Maintenance.upsert(s, dir, upd.unionByName(ins))
      PDataset.scanParquet(s, dir).toDF.orderBy("o_orderkey")
    }),

    // Metadata-only schema evolution: addColumns rewrites ONLY the
    // schema sidecar (old files null-fill at read), then an upsert
    // lands values for the new column in just its routed partitions.
    // Metadata-only RENAME COLUMN (Delta column-mapping): the sidecar
    // maps logical -> physical (on-disk) names; reads translate at the
    // parquet reader boundary (GraftRenameParquetFileFormat), writes
    // map back, zero data files touched by the rename itself. The
    // upsert under the NEW names proves old and new files mix.
    "q_rename_column" -> ((s, d) => {
      val dir = mutableCopy("ordkey20ren", d)(ordersByKey20(s, d))
      graft.operators.Maintenance.renameColumns(s, dir,
        "o_orderkey" -> "order_id", "o_totalprice" -> "price")
      val upd = s.read.parquet(T(d, "orders"))
        .filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 1400)
        .select(col("o_orderkey").as("order_id"), col("o_custkey"),
          col("o_orderstatus"), (col("o_totalprice") * 2).as("price"),
          col("o_orderdate"), col("o_orderpriority"))
      graft.operators.Maintenance.upsert(s, dir, upd)
      PDataset.scanParquet(s, dir).toDF
        .filter(col("order_id") < 2000) // pruned read through the rename
        .orderBy("order_id")
    }),

    // ALTER COLUMN TYPE widening is METADATA-ONLY (the Delta 4 type-
    // widening shape): the narrow int32 files stay on disk and Spark
    // 4's parquet reader serves them as the declared wider type; an
    // upsert then lands values only the wider type can hold next to
    // them. At 100 TB a type migration that rewrites nothing is the
    // difference between a DDL statement and a day of cluster time.
    "q_widen_column" -> ((s, d) => {
      val dir = mutableCopy("ordkey20narrow", d) { out =>
        val base = s.read.parquet(T(d, "orders"))
          .select(col("o_orderkey"), col("o_custkey"),
            (col("o_orderkey") % 1000).cast("int").as("cnt"),
            col("o_totalprice"))
        val ds = PDataset.fromDataFrame(base, Seq("o_orderkey"))
          .reindex(Seq("o_orderkey"))
        ds.repartition(math.max(50L, ds.sizes.get.sum / 20))
          .writeParquet(out)
      }
      graft.operators.Maintenance.widenColumns(s, dir,
        "cnt" -> org.apache.spark.sql.types.LongType)
      // rows in one clustered band get counts only a BIGINT holds
      val upd = s.read.parquet(T(d, "orders"))
        .filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 1400)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_orderkey") + 4000000000L).as("cnt"),
          col("o_totalprice"))
      graft.operators.Maintenance.upsert(s, dir, upd)
      PDataset.scanParquet(s, dir).toDF
        .filter(col("o_orderkey") < 2000) // pruned read, mixed widths
        .orderBy("o_orderkey")
    }),

    "q_schema_evolution" -> ((s, d) => {
      val dir = mutableCopy("ordkey20", d)(ordersByKey20(s, d))
      graft.operators.Maintenance.addColumns(s, dir,
        StructField("o_flag", StringType))
      // The flagged rows are a clustered key band, so the upsert
      // that exercises the widened schema rewrites only the
      // overlapping files — addColumns itself stays metadata-only.
      val upd = s.read.parquet(T(d, "orders"))
        .filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 1400)
        .withColumn("o_flag", lit("FLAGGED"))
      graft.operators.Maintenance.upsert(s, dir, upd)
      PDataset.scanParquet(s, dir).toDF.orderBy("o_orderkey")
    }),

    // Time travel: upsert with retain archives the outgoing
    // generation; reading version 0 returns the pre-upsert table
    // bit-for-bit (full engine surface over the old file listing).
    "q_time_travel" -> ((s, d) => {
      // An archived generation is READ-ONLY: the history (source +
      // retained upsert) builds once, and the timed body is the
      // operator under test — the version-0 scan over the old file
      // listing — not the upsert that created the history.
      val dir = fixture("ordkey20tt", d) { out =>
        ordersByKey20(s, d)(out)
        val upd = s.read.parquet(T(d, "orders"))
          .filter(col("o_orderkey") % 701 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 3)
        graft.operators.Maintenance.upsert(s, out, upd, retain = true)
      }
      graft.operators.Maintenance.scanVersion(s, dir, 0)
        .toDF.orderBy("o_orderkey")
    }),

    // Change-data feed between generations: upsert with retain
    // archives v0, then changes(0) multiset-diffs ONLY the files
    // present in exactly one generation — rows a rewrite carried
    // over unchanged cancel, so the feed is the true row-level delta
    // read from O(delta) files, however big the table.
    "q_changes" -> ((s, d) => {
      // The feed is a READ: build the two-generation history once,
      // time only `changes(0)` — the signed multiset diff over the
      // files present in exactly one generation.
      val dir = ordersFeedFixture(s, d)
      graft.operators.Maintenance.changes(s, dir, 0)
        .orderBy("o_orderkey", "change_type")
    }),

    // The same feed through the SQL table-valued function: a plain
    // spark.sql consumer composes the CDF inside any query (the Delta
    // table_changes shape) — identical plan underneath, so this pins
    // the TVF argument plumbing against the q_changes oracle.
    "q_changes_tvf" -> ((s, d) => {
      val dir = ordersFeedFixture(s, d)
      s.sql(s"SELECT * FROM graft_changes('$dir', 0) " +
        "ORDER BY o_orderkey, change_type")
    }),

    // Duplicate-key CDF pairing: the table holds TWO bit-identical
    // copies of every %701 row; a retained upsert replaces all copies
    // of each such key with one new row. Per key the feed pairs
    // min(losses=2, gains=1)=1 loss with the gain (update pre/post)
    // and tags the surplus copy a plain delete — identical copies
    // make the deterministic hash-ordered pairing oracle-checkable.
    "q_changes_dupkey" -> ((s, d) => {
      val dir = fixture("dupkeyfeed", d) { out =>
        val orders = s.read.parquet(T(d, "orders"))
        val dup = orders.filter(col("o_orderkey") % 701 === 0)
        PDataset.fromDataFrame(
          orders.unionByName(dup).repartition(1)
            .sortWithinPartitions("o_orderkey"),
          Seq("o_orderkey")).writeParquet(out)
        val upd = orders.filter(col("o_orderkey") % 701 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2)
          .withColumn("o_orderpriority", lit("UPD"))
        graft.operators.Maintenance.upsert(s, out, upd, retain = true)
      }
      graft.operators.Maintenance.changes(s, dir, 0)
        .orderBy("o_orderkey", "change_type")
    }),

    // The same change feed consumed through the STREAMING source:
    // readStream.format("graft") from generation 0 must emit exactly
    // the batch feed's rows (the oracle is q_changes's) — offsets are
    // generation numbers, the batch per generation is O(delta).
    "q_changes_stream" -> ((s, d) => {
      val dir = ordersFeedFixture(s, d)
      // bench repeats queries in one session: a unique memory-sink
      // name per invocation keeps runs independent
      val sink = "q_changes_stream_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = s.readStream.format("graft")
        .option("startingVersion", 0).load(dir)
        .writeStream.outputMode("append").format("memory")
        .queryName(sink).start()
      try q.processAllAvailable()
      finally q.stop()
      // materialize + drop the per-run memory sink (the q_sql_ctas
      // pattern): repeated bench rounds must not accumulate UUID-named
      // sink tables in the session
      val out = s.table(sink).orderBy("o_orderkey", "change_type")
      val collected = out.collect()
      s.catalog.dropTempView(sink)
      s.createDataFrame(java.util.Arrays.asList(collected: _*), out.schema)
    }),

    // Streaming exact dedup in bounded state: the documents table
    // duplicated into a file stream, dropDuplicatesWithinWatermark on
    // the codegen content fingerprint — the first arrival of each
    // fingerprint survives, duplicates drop (across micro-batches
    // too), and the seen-hash state evicts as the watermark advances,
    // so an unbounded stream dedups in bounded state. All copies are
    // bit-identical rows, so which copy survives is immaterial and
    // the oracle is the pristine table.
    "q_stream_dedup" -> ((s, d) => {
      val src = fixture("streamdocs", d) { out =>
        val docs = s.read.parquet(T(d, "documents")).select(
          col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"),
          lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
            .as("ingest_ts"))
        docs.unionByName(docs).repartition(4).write.parquet(out)
      }
      val sink = "q_stream_dedup_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val stream = graft.streaming.DocumentStreams.readDocumentStream(s, src)
      val q = graft.streaming.DocumentStreams.dedupByContent(stream)
        .writeStream.outputMode("append").format("memory")
        .queryName(sink).start()
      try q.processAllAvailable()
      finally q.stop()
      // materialize + drop the per-run memory sink (see q_changes_stream)
      val out = s.table(sink)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
      val collected = out.collect()
      s.catalog.dropTempView(sink)
      s.createDataFrame(java.util.Arrays.asList(collected: _*), out.schema)
    }),

    // Streaming NEAR-DUP ingestion: the batch (doc_id % 10 == 0)
    // streams through DocumentStreams.dedupSink, which dedups each
    // micro-batch against the persisted MinHash index and appends
    // survivors to the corpus + their bands to the index, exactly-once
    // via txn-stamped appends. One micro-batch here, so the final
    // corpus = corpus ∪ dedupBatch survivors — the same policy the
    // q_dedup_batch oracle recomputes over the exact pair set.
    "q_stream_ingest" -> ((s, d) => {
      val root = mutableCopy("ingestpair", d) { out =>
        val corpus = scan(s, d, "documents").toDF
          .filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
        PDataset.fromDataFrame(corpus, Seq("doc_id"))
          .writeParquet(out + "/corpus")
        Dedup.buildMinhashIndex(s, corpus, "doc_id", "text",
          out + "/idx")
      }
      val src = fixture("ingestbatch", d) { out =>
        s.read.parquet(T(d, "documents"))
          .filter(col("doc_id") % 10 === 0).select("doc_id", "text")
          .coalesce(1).write.parquet(out)
      }
      val stream = s.readStream.schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType))))
        .parquet(src)
      val q = graft.streaming.DocumentStreams.dedupSink(stream,
        "doc_id", "text", root + "/corpus", root + "/idx",
        tmp("q-stream-ingest-ck"))
      try q.processAllAvailable()
      finally q.stop()
      PDataset.scanParquet(s, root + "/corpus").toDF
        .select("doc_id", "text").orderBy("doc_id")
    }),

    // Continuous ANN ingestion: an embedding stream grows the
    // persisted vector index behind a near-dup gate — the vector twin
    // of q_stream_ingest. Planted exact copies of indexed vectors
    // drop (cosine 1.0 ≥ 0.9999; nprobe = nlist makes the gate
    // exhaustive), organic vectors all survive (no sf0.01 pair
    // reaches even 0.9 — pinned by q_dedup_embedding), exactly-once
    // via the txn-stamped append.
    "q_vector_ingest" -> ((s, d) => {
      val root = mutableCopy("vecingest", d) { out =>
        graft.operators.VectorIndex.build(s,
          s.read.parquet(T(d, "embeddings"))
            .filter(col("vec_id") < 400).select("vec_id", "embedding"),
          "vec_id", "embedding", out + "/idx", dim = 64, nlist = 8)
        ()
      }
      val src = fixture("vecingestbatch", d) { out =>
        val e = s.read.parquet(T(d, "embeddings"))
        e.filter(col("vec_id") >= 400 && col("vec_id") < 800)
          .select("vec_id", "embedding")
          .unionByName(e.filter(col("vec_id") < 10)
            .select((col("vec_id") + 100000L).as("vec_id"),
              col("embedding")))
          .coalesce(1).write.parquet(out)
      }
      val stream = s.readStream.schema(StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
        .parquet(src)
      val q = graft.streaming.VectorStreams.vectorSink(stream,
        "vec_id", "embedding", root + "/idx",
        tmp("q-vector-ingest-ck"), threshold = 0.9999, nprobe = 8)
      try q.processAllAvailable()
      finally q.stop()
      s.read.format("graft").load(root + "/idx")
        .select(col("id").as("vec_id")).orderBy("vec_id")
    }),

    // Incrementally-maintained aggregate view: build once, mutate the
    // source with retained ops, refresh off the change feed (O(view +
    // delta), the source is never rescanned), read the view. The
    // measure column is integral-valued so incremental double sums
    // are exact and the plain GROUP BY oracle matches bit-for-bit.
    "q_incremental_view" -> ((s, d) => {
      // Source AND view come from one build-once pair fixture; each
      // run mutates a fresh copy (retargeting the copied view to the
      // copied source — content hashes match, so the rebind is
      // exact), so the timed body is the operator under test:
      // retained mutations + the O(view + delta) refresh, not five
      // commits of fixture construction.
      val root = mutableCopy("ordqtypair", d) { out =>
        ordersQty20(s, d)(out + "/src")
        graft.operators.IncrementalAgg.build(
          s, out + "/src", out + "/view", Seq("o_custkey"), Seq("o_qty"))
      }
      val dir = root + "/src"
      val viewDir = root + "/view"
      graft.operators.IncrementalAgg.retarget(s, viewDir, dir)
      // CDC-shaped delta: updates and deletes are CLUSTERED key
      // bands and inserts land past the end of the index range, so
      // the retained upsert/delete rewrite only the overlapping
      // files and the feed diffs only those — the engine's
      // affected-file pruning under test. (The uniform-spread
      // worst case, where every file overlaps the delta, is what
      // q_upsert / q_delete_keys measure.)
      val orders = s.read.parquet(T(d, "orders"))
      val upd = orders
        .filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 1400)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_orderkey") % 7).cast("double").as("o_qty"))
      val ins = orders.filter(col("o_orderkey") % 997 === 0)
        .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
          col("o_custkey"), lit(3.0).as("o_qty"))
      graft.operators.Maintenance.upsert(
        s, dir, upd.unionByName(ins), retain = true)
      val dels = orders
        .filter(col("o_orderkey") >= 100 && col("o_orderkey") < 300)
        .select("o_orderkey")
      graft.operators.Maintenance.deleteKeys(s, dir, dels, retain = true)
      graft.operators.IncrementalAgg.refresh(s, viewDir)
      PDataset.scanParquet(s, viewDir).toDF.orderBy("o_custkey")
    }),

    // Incremental distinct-count view: per-group HLL sketches merge
    // under the insert-only delta (no source rescan), and the result
    // row carries whether each group's estimate lands within
    // tolerance of the exact distinct count — a DETERMINISTIC
    // boolean (sketches are deterministic), so the plain-SQL oracle
    // pins it TRUE alongside the exact row counts.
    "q_distinct_view" -> ((s, d) => {
      val root = mutableCopy("ordpriopair", d) { out =>
        val df = s.read.parquet(T(d, "orders"))
          .select(col("o_orderkey"), col("o_custkey"),
            (col("o_orderkey") % 50).cast("double").as("o_qty"),
            col("o_orderpriority"))
        val ds = PDataset.fromDataFrame(df, Seq("o_orderkey"))
        ds.repartition(math.max(50L, ds.sizes.get.sum / 20))
          .writeParquet(out + "/src")
        graft.operators.IncrementalAgg.build(
          s, out + "/src", out + "/view", Seq("o_custkey"),
          Seq("o_qty"), Nil, Seq("o_orderpriority"))
      }
      val dir = root + "/src"
      val viewDir = root + "/view"
      graft.operators.IncrementalAgg.retarget(s, viewDir, dir)
      val ins = s.read.parquet(T(d, "orders"))
        .filter(col("o_orderkey") % 997 === 0)
        .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
          col("o_custkey"), lit(3.0).as("o_qty"),
          lit("X-NEW").as("o_orderpriority"))
      graft.operators.Maintenance.upsert(s, dir, ins, retain = true)
      graft.operators.IncrementalAgg.refresh(s, viewDir)
      val est = graft.operators.IncrementalAgg.distinctEstimates(s, viewDir)
      val exact = PDataset.scanParquet(s, dir).toDF
        .groupBy("o_custkey")
        .agg(countDistinct("o_orderpriority").as("xd"))
      est.join(exact, "o_custkey")
        .select(col("o_custkey"), col("n"),
          (abs(col("o_orderpriority_nd") - col("xd")) <=
            greatest(lit(2.0), col("xd") * 0.1)).as("nd_ok"))
        .orderBy("o_custkey")
    }),

    // Materialized-view rewrite: with the view registered, this
    // source aggregate is transparently answered from the view (the
    // ViewRewriteSpec pins that the plan scans the view, not the
    // source; here the oracle pins that the answer is still right).
    "q_view_rewrite" -> ((s, d) => {
      val src = ordQtySrc(s, d)
      val view = fixture("ordqtyview", d) { out =>
        graft.operators.IncrementalAgg.build(
          s, src, out, Seq("o_custkey"), Seq("o_qty"))
      }
      graft.plans.ViewRewrite.register(s, view)
      s.read.format("graft").load(src)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("o_qty").as("o_qty_sum"))
        .orderBy("o_custkey")
    }),

    // Metadata-only count(*): answered from sidecar row counts — a
    // LocalTableScan, zero files read at any table size
    // (MetadataCountSpec pins the plan; the oracle pins the value).
    "q_metadata_count" -> ((s, d) =>
      s.read.format("graft").load(ordQtySrc(s, d))
        .agg(count(lit(1)).as("n"))),

    // RESTORE: roll back to the archived pre-upsert generation — a
    // metadata-only swap (zero data I/O at any table size); the scan
    // afterwards is bit-for-bit the original table.
    // Merge-on-read delete (deletion vectors): the same scattered
    // key set as q_delete_keys — which rewrites one file per hit —
    // marks row positions in a KB-scale overlay commit instead, and
    // the merge-on-read scan anti-joins the broadcast vectors. Zero
    // data files rewritten at any table size.
    "q_delete_dv" -> ((s, d) => {
      val dir = mutableCopy("ordkey20", d)(ordersByKey20(s, d))
      val keys = s.read.parquet(T(d, "orders"))
        .filter(col("o_orderkey") % 401 === 0 && col("o_orderkey") =!= 0)
        .select("o_orderkey")
      graft.operators.DeletionVectors.deleteKeys(s, dir, keys)
      graft.operators.DeletionVectors.deleteWhere(s, dir,
        col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 13 === 0)
      // Read back through the SQL surface: format("graft") applies
      // pending vectors transparently (same rows as DeletionVectors
      // .scan — the oracle pins it).
      s.read.format("graft").load(dir).orderBy("o_orderkey")
    }),

    // Table history (DESCRIBE HISTORY): one row per readable
    // generation, answered driver-side from the KB-scale archived
    // metadata — zero data files read at any table size (the
    // MaintenanceSpec pins records-read == 0). replaced_at is
    // wall-clock, so the query projects the deterministic columns
    // and the oracle derives each generation's row count from the
    // same mutation arithmetic.
    "q_history" -> ((s, d) => {
      // The ledger READ is the operator under test and it mutates
      // nothing, so the mutated three-generation table is a
      // build-once fixture — the timed body is the driver-side
      // history read, not five commits of fixture construction.
      val dir = ordersHist3Fixture(s, d)
      s.read.format("graft").option("history", "true").load(dir)
        .select("version", "is_current", "n_rows").orderBy("version")
    }),

    // Per-commit change-data feed (the full Delta-CDF shape): each
    // generation step's delta tagged with _commit_version — WHICH
    // commit changed a row, at the cost of per-step diffs instead of
    // one endpoint diff. The wall-clock _commit_timestamp is dropped
    // for determinism; the oracle rederives each step's rows and its
    // version tag from the fixture's mutation arithmetic.
    "q_changes_cdf" -> ((s, d) => {
      val dir = ordersHist3Fixture(s, d)
      s.read.format("graft").option("changesFrom", "0")
        .option("commitInfo", "true").load(dir)
        .drop("_commit_timestamp")
        .orderBy("o_orderkey", "change_type")
    }),

    // Column-stats data skipping: per-file min/max on a NON-index
    // column (`_graft_colstats.json`) prune planned files for range
    // predicates the lex index can't serve — the Delta/Iceberg
    // column-stats pattern. The fixture derives o_v = o_orderkey * 3
    // so the stats column correlates with the clustering and the
    // range genuinely prunes (ColumnStatsSpec pins planned-file
    // counts); the oracle recomputes the same filter in plain SQL, so
    // any wrong pruning (dropped rows) breaks the hash.
    "q_colstats" -> ((s, d) => {
      s.read.format("graft").load(colstatsFixture(s, d))
        .filter(col("o_v") >= 6000L && col("o_v") < 9000L)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Metadata-only min/max/count(col): with complete column-stats
    // coverage an ungrouped aggregate folds driver-side from the
    // sidecars — zero files read at any table size
    // (MetadataCountSpec pins the LocalTableScan plan and the
    // decline-on-incomplete-coverage case; the oracle pins values).
    // count(o_totalprice) counts a DOUBLE column from recorded null
    // counts; min/max stay on the exact integer column.
    "q_metadata_minmax" -> ((s, d) =>
      s.read.format("graft").load(colstatsFixture(s, d)).agg(
        min(col("o_v")).as("v_min"), max(col("o_v")).as("v_max"),
        sum(col("o_v")).as("v_sum"),
        count(col("o_totalprice")).as("price_n"),
        count(lit(1)).as("n"))),

    // Metadata-only GROUPED aggregates: the table is bucket-clustered
    // (every file constant in the leading index column), so GROUP BY
    // bucket answers count/min/max/sum per group purely from sidecar
    // row counts + column stats — zero files read at any table size
    // (the date-partitioned `GROUP BY event_date` shape).
    // MetadataCountSpec pins the LocalTableScan plan; this query pins
    // the VALUES against DuckDB.
    "q_metadata_groupby" -> ((s, d) => {
      val dir = bucketedOrdersFixture(s, d)
      s.read.format("graft").load(dir)
        .groupBy("bucket").agg(count(lit(1)).as("n"),
          min("o_custkey").as("min_ck"), max("o_custkey").as("max_ck"),
          sum("o_custkey").as("sum_ck"))
        .orderBy("bucket")
    }),

    // CHECK constraints: the write-path guard run as a dry-run —
    // per-constraint violation counts of a candidate delta, all
    // constraints in ONE aggregate job (Constraints.audit). The
    // fixture table (rows satisfying all three checks) records them
    // via the public add() (each a single counting scan); the delta
    // is an unfiltered lineitem slice, so the per-constraint counts
    // are plain SQL over the same rows — the oracle. c_flag_qty's
    // CASE yields NULL for non-'A' rows, pinning the ANSI
    // TRUE-or-NULL-passes semantics in both engines.
    "q_constraint" -> ((s, d) => {
      val dir = fixture("constraints", d) { out =>
        val li = s.read.parquet(T(d, "lineitem"))
          .filter(col("l_discount") <= 0.05 && col("l_quantity") < 45)
        PDataset.fromDataFrame(li, Seq("l_orderkey")).writeParquet(out)
        graft.operators.Constraints.add(
          s, out, "c_discount", "l_discount <= 0.05")
        graft.operators.Constraints.add(
          s, out, "c_quantity", "l_quantity < 45")
        graft.operators.Constraints.add(s, out, "c_flag_qty",
          "CASE WHEN l_returnflag = 'A' THEN l_quantity <= 49 END")
      }
      val delta = s.read.parquet(T(d, "lineitem"))
        .filter(col("l_orderkey") % 11 === 0)
      graft.operators.Constraints.audit(s, dir, delta).orderBy("name")
    }),

    // File-aligned WHERE + metadata fold: the predicate provably
    // keeps whole files (bucket-clustered fixture), so the filtered
    // count/min/max/sum still answers driver-side with zero files
    // read — the "count rows in a date range" interactive shape.
    "q_metadata_filtered" -> ((s, d) => {
      val dir = bucketedOrdersFixture(s, d)
      s.read.format("graft").load(dir)
        .filter(col("bucket") >= 2)
        .agg(count(lit(1)).as("n"), min("o_custkey").as("min_ck"),
          max("o_custkey").as("max_ck"), sum("o_custkey").as("sum_ck"))
    }),

    // Continuous replication end-to-end: a replica seeded from the
    // same snapshot, converged through the source's CDC stream across
    // a retained upsert (updates + inserts) and a retained key
    // delete. The returned rows are the REPLICA's — the oracle is the
    // mutated source recomputed in SQL, so a replication bug (missed
    // delta, double apply, key mix-up) breaks the hash.
    "q_replica" -> ((s, d) => {
      // The source history (one retained upsert + one retained key
      // delete) builds ONCE and is only read here; each run seeds a
      // fresh replica from the pristine snapshot and times the
      // operator under test — the change-feed stream catching up
      // from generation 0 and applying the deltas as merge commits —
      // not the five commits of source mutation.
      val src = fixture("ordkey20replsrc", d) { out =>
        ordersByKey20(s, d)(out)
        val orders = s.read.parquet(T(d, "orders"))
        val upd = orders.filter(col("o_orderkey") % 701 === 0)
          .withColumn("o_orderstatus", lit("U"))
          .withColumn("o_totalprice", col("o_totalprice") * 2)
        val ins = orders.filter(col("o_orderkey") % 997 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
          .withColumn("o_orderpriority", lit("NEW"))
        graft.operators.Maintenance.upsert(s, out,
          upd.unionByName(ins), retain = true)
        graft.operators.Maintenance.deleteKeys(s, out,
          orders.filter(col("o_orderkey") % 401 === 0 &&
            col("o_orderkey") =!= 0).select("o_orderkey"),
          retain = true)
      }
      val dst = mutableCopy("ordkey20", d)(ordersByKey20(s, d))
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-replica-ckpt").toString
      val q = graft.streaming.Replication.replicaSink(s, src, dst, ckpt,
        startingVersion = Some("0"))
      try q.processAllAvailable() finally q.stop()
      PDataset.scanParquet(s, dst).toDF.orderBy("o_orderkey")
    }),

    // The V2 TableCatalog end-to-end: CREATE TABLE / INSERT INTO by
    // NAME (the graft sink's one-shuffle append under the V1 write
    // fallback), one retained mutation, then Spark's native
    // `VERSION AS OF 0` SQL resolved through the retained-generation
    // ledger — the timed body is the time-travel read over the
    // sidecar-served DSv2 scan; the oracle is the pristine table.
    "q_catalog" -> ((s, d) => {
      val wh = fixture("catalogwh", d) { out =>
        s.conf.set("spark.sql.catalog.gcat",
          "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.gcat.warehouse", out)
        s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
        s.sql("CREATE TABLE gcat.db.orders_cat (o_orderkey BIGINT, " +
          "o_custkey BIGINT, o_totalprice DOUBLE) USING graft " +
          "TBLPROPERTIES('index'='o_orderkey')")
        s.read.parquet(T(d, "orders"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .createOrReplaceTempView("cat_orders_src")
        s.sql("INSERT INTO gcat.db.orders_cat " +
          "SELECT * FROM cat_orders_src")
        graft.operators.Maintenance.deleteKeys(s,
          out + "/db/orders_cat",
          s.read.parquet(T(d, "orders"))
            .filter(col("o_orderkey") % 401 === 0 &&
              col("o_orderkey") =!= 0)
            .select("o_orderkey"),
          retain = true)
      }
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("SELECT * FROM gcat.db.orders_cat VERSION AS OF 0 " +
        "ORDER BY o_orderkey")
    }),

    // The statement-level DDL surface end-to-end: two ALTER TABLE ADD
    // CONSTRAINT (each validating the table in one counting scan), a
    // DROP, and the SHOW CONSTRAINTS listing — all via spark.sql
    // against a fresh mutable copy (declares mutate the sidecar).
    "q_sql_ddl" -> ((s, d) => {
      val dir = mutableCopy("ordkey20", d)(ordersByKey20(s, d))
      val g = s"graft.`$dir`"
      s.sql(s"ALTER TABLE $g ADD CONSTRAINT price_pos " +
        "CHECK (o_totalprice > 0)")
      s.sql(s"ALTER TABLE $g ADD CONSTRAINT key_nn " +
        "CHECK (o_orderkey IS NOT NULL)")
      s.sql(s"ALTER TABLE $g DROP CONSTRAINT price_pos")
      s.sql(s"SHOW CONSTRAINTS $g")
    }),

    // The maintenance STATEMENT surface under the hard correctness
    // signal: OPTIMIZE (bin-pack rewrite), RESTORE TO VERSION AS OF
    // (metadata-only rollback — safe because non-retained rewrites
    // never delete files an archived generation references), and
    // DESCRIBE DETAIL, all via spark.sql; the deterministic detail
    // columns are pinned against plain SQL over the source table.
    "q_sql_maintenance" -> ((s, d) => {
      val dir = mutableCopy("ordkey20hist", d) { out =>
        ordersByKey20(s, d)(out)
        val upd = s.read.parquet(T(d, "orders"))
          .filter(col("o_orderkey") % 701 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 5)
        graft.operators.Maintenance.upsert(s, out, upd, retain = true)
      }
      val g = s"graft.`$dir`"
      // scoped pass first (one key band, only contiguous in-scope
      // runs merge — O(band) at any table size), then the full pass
      s.sql(s"OPTIMIZE $g WHERE o_orderkey < 5000 TARGET 100000 ROWS")
      s.sql(s"OPTIMIZE $g TARGET 100000 ROWS")
      s.sql(s"RESTORE TABLE $g TO VERSION AS OF 0")
      s.sql(s"DESCRIBE DETAIL $g")
        .select(col("index_columns"), col("n_rows"),
          col("n_constraints"), col("pending_deletion_vectors"),
          col("retained_versions"))
    }),

    // COPY INTO under the hard correctness signal: idempotent
    // incremental file ingestion — drop 1 lands and loads, the
    // re-run loads NOTHING (a double-load would break the oracle's
    // row count), drop 2 lands later and loads alone, and the final
    // table equals the full source. The ledger rides each append's
    // atomic sidecar commit, so a scheduled COPY INTO over a 100 TB
    // landing zone re-reads only the new drops.
    "q_copy_into" -> ((s, d) => {
      // Pristine CONVERTed base table + deterministic landing drops
      // build once per process (the fixture discipline); each run
      // mutates a fresh copy. The timed body is the operator under
      // test: three COPY INTO commits (initial load, exactly-once
      // no-op re-run, incremental second drop) — the second drop
      // arrives via a driver-side file move of pre-staged bytes, so
      // no fixture Spark write rides inside the timing.
      val root = mutableCopy("copyinpair", d) { out =>
        val orders = s.read.parquet(T(d, "orders"))
        val table = out + "/t"
        // the base table starts life as BARE parquet and is adopted in
        // place: CONVERT TO GRAFT = one stats job, zero data rewritten
        orders.filter(col("o_orderkey") % 3 === 0)
          .repartitionByRange(4, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey")
          .write.parquet(table)
        s.sql(s"CONVERT TO GRAFT '$table' INDEX (o_orderkey)")
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(out, "landing"))
        graft.core.Sidecar.writeSingleParquet(
          orders.filter(col("o_orderkey") % 3 === 1),
          out + "/landing/drop1.parquet")
        graft.core.Sidecar.writeSingleParquet(
          orders.filter(col("o_orderkey") % 3 === 2),
          out + "/staged-drop2.parquet")
      }
      val table = root + "/t"
      val landing = root + "/landing"
      val g = s"graft.`$table`"
      s.sql(s"COPY INTO $g FROM '$landing' FILEFORMAT = PARQUET")
      s.sql(s"COPY INTO $g FROM '$landing' FILEFORMAT = PARQUET")
      java.nio.file.Files.move(
        java.nio.file.Paths.get(root + "/staged-drop2.parquet"),
        java.nio.file.Paths.get(landing + "/drop2.parquet"))
      s.sql(s"COPY INTO $g FROM '$landing' FILEFORMAT = PARQUET")
      s.read.format("graft").load(table).orderBy("o_orderkey")
    }),

    // WebDataset INGESTION: tar shards in a landing zone COPY INTO a
    // graft documents table — member stems become the index column,
    // member bytes the text column, with the same exactly-once source
    // ledger as every other FILEFORMAT (the immediate re-run loads
    // nothing). The interchange loop closes: export (q_webdataset)
    // and ingest are inverses.
    "q_copy_into_tar" -> ((s, d) => {
      // Base table + deterministic (seeded) tar shards build once per
      // process; each run mutates a fresh copy. Timed body = the
      // operator under test: the COPY INTO load + exactly-once no-op.
      val root = mutableCopy("copytarpair", d) { out =>
        val docs = s.read.parquet(T(d, "documents")).select("doc_id", "text")
        PDataset.fromDataFrame(docs.filter(col("doc_id") < 100), Seq("doc_id"))
          .reindex(Seq("doc_id")).writeParquet(out + "/t")
        graft.operators.Export.writeTarShards(
          docs.filter(col("doc_id") >= 100), "doc_id", "text",
          out + "/landing", numShards = 4, seed = "drop1")
      }
      val g = s"graft.`${root + "/t"}`"
      s.sql(s"COPY INTO $g FROM '${root + "/landing"}' FILEFORMAT = TAR")
      s.sql(s"COPY INTO $g FROM '${root + "/landing"}' FILEFORMAT = TAR") // no-op
      s.read.format("graft").load(root + "/t").orderBy("doc_id")
    }),

    // Multi-member WebDataset INGESTION: paired <id>.txt + <id>.lng
    // members reassemble by stem onto a THREE-column table via
    // FORMAT_OPTIONS('members'='txt:text,lng:lang') — the full
    // inverse of the multi-column export (q_webdataset_multi), same
    // exactly-once ledger (the re-run loads nothing).
    "q_copy_into_tar_multi" -> ((s, d) => {
      // Same fixture discipline as q_copy_into_tar (multi-member
      // shards); timed body = the two COPY INTO commits.
      val root = mutableCopy("copytarmpair", d) { out =>
        val docs = s.read.parquet(T(d, "documents"))
          .select("doc_id", "text", "lang")
        PDataset.fromDataFrame(docs.filter(col("doc_id") < 100), Seq("doc_id"))
          .reindex(Seq("doc_id")).writeParquet(out + "/t")
        graft.operators.Export.writeTarShards(
          docs.filter(col("doc_id") >= 100), "doc_id",
          Seq("text" -> "txt", "lang" -> "lng"), out + "/landing",
          numShards = 4, seed = "drop1")
      }
      val g = s"graft.`${root + "/t"}`"
      val opts = "FORMAT_OPTIONS('members'='txt:text,lng:lang')"
      s.sql(s"COPY INTO $g FROM '${root + "/landing"}' FILEFORMAT = TAR $opts")
      s.sql(s"COPY INTO $g FROM '${root + "/landing"}' FILEFORMAT = TAR $opts")
      s.read.format("graft").load(root + "/t").orderBy("doc_id")
    }),

    // CommonCrawl-shape INGESTION: WET shards in a landing zone COPY
    // INTO a graft table — WARC-Target-URI becomes the index column,
    // record bodies the text column, with the same exactly-once
    // source ledger (the immediate re-run loads nothing). The WET
    // export half (writeWetShards) feeds the fixture, closing the
    // WARC interchange loop the same way q_webdataset/q_copy_into_tar
    // close the tar loop.
    "q_copy_into_warc" -> ((s, d) => {
      // Same fixture discipline as q_copy_into_tar (WET shards);
      // timed body = the two COPY INTO commits.
      val root = mutableCopy("copywarcpair", d) { out =>
        val docs = s.read.parquet(T(d, "documents"))
          .select(concat(lit("http://example.com/doc/"), col("doc_id"))
            .as("uri"), col("text"), col("doc_id"))
        PDataset.fromDataFrame(
          docs.filter(col("doc_id") < 100).select("uri", "text"), Seq("uri"))
          .reindex(Seq("uri")).writeParquet(out + "/t")
        graft.operators.Warc.writeWetShards(
          docs.filter(col("doc_id") >= 100), "uri", "text",
          out + "/landing", numShards = 4, seed = "drop1")
      }
      val g = s"graft.`${root + "/t"}`"
      s.sql(s"COPY INTO $g FROM '${root + "/landing"}' FILEFORMAT = WARC")
      s.sql(s"COPY INTO $g FROM '${root + "/landing"}' FILEFORMAT = WARC") // no-op
      s.read.format("graft").load(root + "/t").orderBy("uri")
    }),

    // JSONL INGESTION (how C4/Dolma-style dumps actually land:
    // one JSON object per line, gzip'd): the landing files carry the
    // dump's OWN field names (id/body/language), mapped onto the
    // table's columns via FORMAT_OPTIONS('fields'=...), through the
    // same exactly-once source ledger (the immediate re-run loads
    // nothing). Malformed lines and absent mapped fields refuse
    // loudly — CopyIntoSpec pins both.
    "q_copy_into_jsonl" -> ((s, d) => {
      // Same fixture discipline as q_copy_into_tar (gzip'd JSONL
      // drops); timed body = the two COPY INTO commits.
      val root = mutableCopy("copyjsonlpair", d) { out =>
        val docs = s.read.parquet(T(d, "documents"))
          .select("doc_id", "text", "lang")
        PDataset.fromDataFrame(docs.filter(col("doc_id") < 100), Seq("doc_id"))
          .reindex(Seq("doc_id")).writeParquet(out + "/t")
        docs.filter(col("doc_id") >= 100)
          .select(to_json(struct(col("doc_id").as("id"),
            col("text").as("body"), col("lang").as("language"))).as("value"))
          .coalesce(4)
          .write.option("compression", "gzip").text(out + "/landing")
      }
      val g = s"graft.`${root + "/t"}`"
      val opts =
        "FORMAT_OPTIONS('fields'='id:doc_id,body:text,language:lang')"
      s.sql(s"COPY INTO $g FROM '${root + "/landing"}' FILEFORMAT = JSONL $opts")
      s.sql(s"COPY INTO $g FROM '${root + "/landing"}' FILEFORMAT = JSONL $opts")
      s.read.format("graft").load(root + "/t").orderBy("doc_id")
    }),

    // SQL DELETE FROM through the V2 catalog: the pushed range
    // predicate routes through SupportsDeleteV2 onto the deletion-
    // vector overlay (a KB-scale commit, zero files rewritten), and
    // the read back serves merge-on-read — deleted rows invisible.
    // One process-wide catalog (stable warehouse), fresh TABLE name
    // per run: CatalogManager caches catalog instances by name.
    "q_sql_delete" -> ((s, d) => {
      val t = mutableCatalogTable(s, "ordkey20", d)(ordersByKey20(s, d))
      s.sql(s"DELETE FROM $t " +
        "WHERE o_orderkey >= 1000 AND o_orderkey < 2000")
      s.sql(s"SELECT * FROM $t ORDER BY o_orderkey")
    }),

    // SQL UPDATE through the analyzer rewrite onto the copy-on-write
    // updateWhere: the sidecar pruning walk + one pushed-down
    // discovery scan find the files with hits, and ONLY those are
    // rewritten (a clustered key band touches 1-2 of the 20 files at
    // this layout — and the same fraction at 100 TB).
    "q_sql_update" -> ((s, d) => {
      val t = mutableCatalogTable(s, "ordkey20", d)(ordersByKey20(s, d))
      s.sql(s"UPDATE $t SET o_totalprice = o_totalprice * 2, " +
        "o_orderstatus = 'U' " +
        "WHERE o_orderkey >= 1000 AND o_orderkey < 2000")
      s.sql(s"SELECT * FROM $t ORDER BY o_orderkey")
    }),

    // SQL MERGE INTO: matched deletes, matched updates and unmatched
    // inserts classified with one join per side, then applied as ONE
    // Maintenance.merge commit rewriting only affected partitions.
    // Atomic CTAS through the staging catalog: the query writes a
    // hidden staged sibling, ONE rename installs it — then CREATE OR
    // REPLACE re-stages and swaps wholesale (replaced content moved
    // aside first). The read back is the hard signal.
    "q_sql_ctas" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.gmut", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gmut.warehouse", mutWarehouse)
      val t = "gmut.ctas" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(12)
      s.read.parquet(T(d, "orders")).createOrReplaceTempView("ctas_orders")
      s.sql(s"CREATE TABLE $t USING graft " +
        "TBLPROPERTIES('index'='o_orderkey') AS " +
        "SELECT * FROM ctas_orders WHERE o_orderkey % 3 = 0")
      s.sql(s"CREATE OR REPLACE TABLE $t USING graft " +
        "TBLPROPERTIES('index'='o_orderkey') AS " +
        "SELECT * FROM ctas_orders WHERE o_orderkey % 2 = 0")
      val out = s.sql(s"SELECT * FROM $t ORDER BY o_orderkey")
      // materialize, then DROP: the fixture leaves no per-run table
      // behind and the drop path itself runs under the bench. The
      // result is a bench-scale slice (half of orders), so the local
      // relation is driver-safe; the distributed work (CTAS ×2 +
      // ordered read) already happened above.
      val collected = out.collect()
      s.sql(s"DROP TABLE $t")
      s.createDataFrame(
        java.util.Arrays.asList(collected: _*), out.schema)
    }),

    // Zero-copy table branch: CREATE TABLE ... SHALLOW CLONE writes
    // ONE KB-scale sidecar referencing the source's files by absolute
    // path — no data job, so branching a 100 TB table costs the same
    // as branching this one. A deleteRange on the clone then diverges
    // copy-on-write: the band's references drop, out-of-band files
    // keep being READ FROM THE SOURCE, and no source byte is written
    // or deleted (asserted below, not just implied).
    "q_shallow_clone" -> ((s, d) => {
      val src = fixture("ordkey20", d)(ordersByKey20(s, d))
      val dst = tmp("graft-clone")
      s.sql(s"CREATE TABLE graft.`$dst` SHALLOW CLONE graft.`$src`")
      graft.operators.Maintenance.deleteRange(s, dst,
        Seq(Some(1000L)), Seq(Some(2000L)))
      val total = s.read.parquet(T(d, "orders")).count()
      require(PDataset.scanParquet(s, src).toDF.count() == total,
        "shallow clone mutated its source table")
      val out = s.read.format("graft").load(dst).orderBy("o_orderkey")
      // materialize, then remove the per-run clone dir (CTAS pattern:
      // no fixture leak; the distributed work already happened)
      val collected = out.collect()
      graft.core.Sidecar.deleteRecursively(java.nio.file.Paths.get(dst))
      s.createDataFrame(
        java.util.Arrays.asList(collected: _*), out.schema)
    }),

    // Delta-style scoped overwrite: INSERT INTO ... REPLACE WHERE
    // replaces a clustered key band in ONE commit — only the band's
    // files are rewritten (survivors keep their rows), the incoming
    // rows land index-sorted beside them, out-of-scope rows refuse.
    "q_replace_where" -> ((s, d) => {
      val t = mutableCatalogTable(s, "ordkey20", d)(ordersByKey20(s, d))
      s.read.parquet(T(d, "orders"))
        .filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 2000 &&
          col("o_orderkey") % 2 === 0)
        .withColumn("o_orderpriority", lit("REPLACED"))
        .createOrReplaceTempView("rw_src")
      s.sql(s"INSERT INTO $t " +
        "REPLACE WHERE o_orderkey >= 1000 AND o_orderkey < 2000 " +
        "SELECT * FROM rw_src")
      s.sql(s"SELECT * FROM $t ORDER BY o_orderkey")
    }),

    // MERGE WITH SCHEMA EVOLUTION: a source-only column widens the
    // target through the V2 catalog's alterTable (a metadata-only
    // commit — old files serve the new column as null) BEFORE the
    // clauses resolve, so a CDC stream that grew a field lands
    // without a manual ALTER — Delta's autoMerge contract, expressed
    // through Spark 4's native AUTOMATIC_SCHEMA_EVOLUTION capability.
    "q_sql_merge_evolve" -> ((s, d) => {
      val t = mutableCatalogTable(s, "ordkey20", d)(ordersByKey20(s, d))
      val orders = s.read.parquet(T(d, "orders"))
      orders.filter(col("o_orderkey") % 501 === 0)
        .select(col("o_orderkey").as("k"),
          (col("o_totalprice") * 2).as("np"),
          concat(lit("n"), col("o_orderkey")).as("note"))
        .createOrReplaceTempView("evo_merge_src")
      s.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $t
        USING evo_merge_src s ON $t.o_orderkey = s.k
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.np,
          note = s.note""")
      s.sql(s"""SELECT o_orderkey, round(o_totalprice, 2) AS price,
                       note
                FROM $t ORDER BY o_orderkey""")
    }),

    "q_sql_merge" -> ((s, d) => {
      val t = mutableCatalogTable(s, "ordkey20", d)(ordersByKey20(s, d))
      val orders = s.read.parquet(T(d, "orders"))
      // deletes: existing %401 keys; updates: existing %701 keys (not
      // also %401 — a source key may carry only one action); inserts:
      // shifted %997 keys that match nothing
      val dels = orders
        .filter(col("o_orderkey") % 401 === 0 && col("o_orderkey") =!= 0)
        .select(col("o_orderkey").as("k"), lit(true).as("drop_it"),
          lit(null).cast("double").as("np"),
          col("o_orderdate").as("od"))
      val upds = orders
        .filter(col("o_orderkey") % 701 === 0 &&
          col("o_orderkey") % 401 =!= 0)
        .select(col("o_orderkey").as("k"), lit(false).as("drop_it"),
          (col("o_totalprice") * 2).as("np"),
          col("o_orderdate").as("od"))
      val ins = orders.filter(col("o_orderkey") % 997 === 0)
        .select((col("o_orderkey") + 2000000000L).as("k"),
          lit(false).as("drop_it"),
          (col("o_totalprice") * 3).as("np"),
          col("o_orderdate").as("od"))
      dels.unionByName(upds).unionByName(ins)
        .createOrReplaceTempView("merge_src")
      s.sql(s"""MERGE INTO $t USING merge_src s ON $t.o_orderkey = s.k
        WHEN MATCHED AND s.drop_it THEN DELETE
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.np,
          o_orderpriority = 'MERGED'
        WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey,
          o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
          VALUES (s.k, 0, 'N', s.np, s.od, 'NEW')""")
      s.sql(s"SELECT * FROM $t ORDER BY o_orderkey")
    }),

    "q_restore" -> ((s, d) => {
      // The history builds once; each run copies it and times the
      // operator under test — RESTORE (a metadata-only generation
      // swap) plus the read-back — not the upsert that made v0.
      val dir = mutableCopy("ordkey20hist", d) { out =>
        ordersByKey20(s, d)(out)
        val upd = s.read.parquet(T(d, "orders"))
          .filter(col("o_orderkey") % 701 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 5)
        graft.operators.Maintenance.upsert(s, out, upd, retain = true)
      }
      graft.operators.Maintenance.restore(s, dir, 0)
      PDataset.scanParquet(s, dir).toDF.orderBy("o_orderkey")
    }),

    // Per-file Bloom data skipping: orders indexed (hence pruned) on
    // o_orderdate, bloom-built on the NON-index o_custkey; a point
    // lookup on o_custkey plans only the files whose filter fires
    // (BloomIndexSpec counts planned files). The answer is
    // layout-independent — plain SQL is the oracle.
    "q_bloom_lookup" -> ((s, d) => {
      val dir = fixture("bloom", d) { out =>
        val ds = scan(s, d, "orders").reindex(Seq("o_orderdate"))
        ds.repartition(math.max(200L, ds.sizes.get.sum / 20))
          .writeParquet(out)
        graft.core.BloomIndex.build(s, out, Seq("o_custkey"))
      }
      s.read.format("graft").load(dir)
        .filter(col("o_custkey") === 42L)
        .orderBy("o_orderkey")
    }),

    // -- joins through the co-partitioned range join --
    "q_join_inner" -> ((s, d) => {
      val li = scan(s, d, "lineitem").rename(Map("l_orderkey" -> "okey"))
        .reindex(Seq("okey"))
      val o = scan(s, d, "orders").rename(Map("o_orderkey" -> "okey"))
        .reindex(Seq("okey"))
      li.join(o, "inner").toDF
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // Join through the shuffle-free division-join node, in its
    // at-scale shape: both sides PERSISTED as ~24-partition datasets
    // (one fast write each), so every division slice prunes to its
    // own file through the sidecar index — the division count clears
    // the parallelism gate at any scale factor and the custom
    // co-partitioned path is what the oracle checks.
    "q_join_division" -> ((s, d) => {
      val o = PDataset.scanParquet(s, jdOrdersFixture(s, d))
      val c = PDataset.scanParquet(s, jdCustomerFixture(s, d))
      o.join(c, "inner").toDF
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy("c_mktsegment")
    }),

    // PDataset-level LEFT ANTI through the same shuffle-free node:
    // the decontamination shape as a library call — customers with no
    // high-value order (every customer has SOME order in this data,
    // so the right side is the filtered big-order table), zero
    // Exchange on either side, left schema only.
    "q_join_division_anti" -> ((s, d) => {
      val oDir = fixture("jd-bigorders", d) { out =>
        val o0 = PDataset.fromDataFrame(
          s.read.parquet(T(d, "orders"))
            .filter(col("o_totalprice") > 400000)
            .withColumnRenamed("o_custkey", "ckey"), Seq("ckey"))
          .reindex(Seq("ckey"))
        o0.repartition(math.max(1L, o0.sizes.get.sum / 24))
          .writeParquet(out)
      }
      val o = PDataset.scanParquet(s, oDir)
      val c = PDataset.scanParquet(s, jdCustomerFixture(s, d))
      c.join(o, "anti").toDF
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          round(sum(col("c_acctbal")), 2).as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    // The SAME co-clustered datasets joined in plain SQL: the
    // SqlDivisionJoin optimizer rule detects two graft reads
    // range-clustered on the join key and plans the zero-Exchange
    // division join for spark.sql() — no PDataset API in sight. A
    // child session (shared SparkContext, own conf) pins
    // autoBroadcastJoinThreshold=-1 so the rule's broadcast gate
    // exercises the division path at every SF without touching the
    // parent session's planning confs. At 100 TB per side this is
    // the difference between two full Exchanges of globally-sorted
    // data and none.
    "q_sql_division_join" -> ((s, d) => {
      val oDir = jdOrdersFixture(s, d)
      val cDir = jdCustomerFixture(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.read.format("graft").load(oDir).createOrReplaceTempView("sdj_o")
      s2.read.format("graft").load(cDir).createOrReplaceTempView("sdj_c")
      s2.sql("""SELECT c_mktsegment, count(*) AS n,
                       round(sum(o_totalprice), 2) AS sum_price
                FROM sdj_o JOIN sdj_c ON sdj_o.ckey = sdj_c.ckey
                GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // Plain-SQL LEFT JOIN through the same rule: the commonest
    // enrichment shape between co-clustered 100 TB tables. The node
    // emits presence markers so unmatched customers surface NULL in
    // the order-side columns (incl. the order-side KEY) with zero
    // Exchange on either side; the oracle counts matched vs total
    // per segment, which is only right if the null-extension rows
    // survive exactly once.
    "q_sql_division_join_left" -> ((s, d) => {
      val oDir = jdOrdersFixture(s, d)
      val cDir = jdCustomerFixture(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.read.format("graft").load(oDir).createOrReplaceTempView("sdjl_o")
      s2.read.format("graft").load(cDir).createOrReplaceTempView("sdjl_c")
      s2.sql("""SELECT c_mktsegment, count(*) AS n,
                       count(o_orderkey) AS n_matched,
                       round(sum(coalesce(o_totalprice, 0)), 2)
                         AS sum_price
                FROM sdjl_c LEFT JOIN sdjl_o
                  ON sdjl_c.ckey = sdjl_o.ckey
                GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // RIGHT OUTER through the rule's side-swap, plus a CROSS-SIDE
    // residual ON conjunct: the residual decides MATCHING inside each
    // division (a customer whose every key-equal order fails
    // o_totalprice > c_acctbal still null-extends exactly once) —
    // post-join-filter semantics would drop those rows and miscount.
    // Zero Exchange on either side.
    "q_sql_division_join_right" -> ((s, d) => {
      val oDir = jdOrdersFixture(s, d)
      val cDir = jdCustomerFixture(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.read.format("graft").load(oDir).createOrReplaceTempView("sdjr_o")
      s2.read.format("graft").load(cDir).createOrReplaceTempView("sdjr_c")
      s2.sql("""SELECT c_mktsegment, count(*) AS n,
                       count(o_orderkey) AS n_matched,
                       round(sum(coalesce(o_totalprice, 0)), 2)
                         AS sum_price
                FROM sdjr_o RIGHT JOIN sdjr_c
                  ON sdjr_o.ckey = sdjr_c.ckey
                     AND sdjr_o.o_totalprice > sdjr_c.c_acctbal
                GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // Plain-SQL LEFT SEMI between co-clustered tables — the
    // containment shape ("customers that ordered") that at corpus
    // scale is decontamination. The node emits the LEFT side only,
    // claims just the KEYS of its right children (the order scan
    // narrows to its key column), and with no residual builds each
    // division's key SET rather than its rows — zero Exchange on
    // either side.
    "q_sql_division_semi" -> ((s, d) => {
      val oDir = jdOrdersFixture(s, d)
      val cDir = jdCustomerFixture(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.read.format("graft").load(oDir).createOrReplaceTempView("sdjs_o")
      s2.read.format("graft").load(cDir).createOrReplaceTempView("sdjs_c")
      s2.sql("""SELECT c_mktsegment, count(*) AS n
                FROM sdjs_c LEFT SEMI JOIN sdjs_o
                  ON sdjs_c.ckey = sdjs_o.ckey
                GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // NOT EXISTS with a CROSS-SIDE residual through the same node as
    // a LEFT ANTI: a customer survives only when NO key-equal order
    // passes o_totalprice < c_acctbal — the residual decides MATCHING
    // inside each division (post-filter semantics would be wrong).
    // Zero Exchange on either side.
    "q_sql_division_anti" -> ((s, d) => {
      val oDir = jdOrdersFixture(s, d)
      val cDir = jdCustomerFixture(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.read.format("graft").load(oDir).createOrReplaceTempView("sdjna_o")
      s2.read.format("graft").load(cDir).createOrReplaceTempView("sdjna_c")
      s2.sql("""SELECT c_mktsegment, count(*) AS n,
                       round(sum(c_acctbal), 2) AS sum_bal
                FROM sdjna_c c WHERE NOT EXISTS
                  (SELECT 1 FROM sdjna_o o
                   WHERE o.ckey = c.ckey
                     AND o.o_totalprice < c.c_acctbal)
                GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // Join + GROUP BY the JOIN KEY, Exchange-free END TO END: the
    // division join node DECLARES its range partitioning (each key
    // group lives wholly inside one division partition), so the
    // aggregation that would otherwise shuffle the ENTIRE join output
    // — at 100 TB the dominant cost of a fact-to-fact rollup — runs
    // in the same stage; the trailing ORDER BY + LIMIT plans as
    // TakeOrderedAndProject, also shuffle-free.
    "q_sql_division_join_agg" -> ((s, d) => {
      val oDir = jdOrdersFixture(s, d)
      val cDir = jdCustomerFixture(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.read.format("graft").load(oDir).createOrReplaceTempView("sdja_o")
      s2.read.format("graft").load(cDir).createOrReplaceTempView("sdja_c")
      s2.sql("""SELECT sdja_o.ckey, count(*) AS n,
                       round(sum(o_totalprice), 2) AS sum_price
                FROM sdja_o JOIN sdja_c ON sdja_o.ckey = sdja_c.ckey
                GROUP BY sdja_o.ckey ORDER BY ckey LIMIT 2000""")
    }),

    // Plain-SQL GROUP BY on the clustering key through the
    // SqlDivisionAgg rule: the partial→Exchange→final aggregation a
    // high-cardinality clustered key would pay — at 100 TB the
    // shuffle is sized by the group count, i.e. nearly the whole
    // table — becomes a union of per-division complete aggregates
    // with ZERO Exchange, one task per contiguous key range. The
    // exact median shows why division-complete groups matter: any
    // aggregate function is eligible, not just the algebraic ones a
    // partial/final split supports.
    "q_sql_division_agg" -> ((s, d) => {
      val oDir = jdOrdersFixture(s, d)
      val s2 = s.newSession()
      // bench-scale fixtures sit under the rewrite's cost-model byte
      // floor (default DivisionRewriteSupport.divisionMinBytes, 1 GiB — always clear at warehouse scale);
      // pin it down so the oracle exercises the division plan
      s2.conf.set("spark.graft.sql.divisionMinBytes", "0")
      s2.read.format("graft").load(oDir).createOrReplaceTempView("sda_o")
      // the median runs over integer CENTS: interpolating two
      // integers < 2^53 is exact in double, so Spark's percentile and
      // the oracle's quantile_cont agree bit-for-bit (raw doubles
      // disagree in the last ulp and can round to different cents)
      s2.sql("""SELECT ckey, count(*) AS n,
                       round(sum(o_totalprice), 2) AS sum_price,
                       percentile(CAST(round(o_totalprice * 100) AS BIGINT),
                                  0.5) AS med_cents
                FROM sda_o GROUP BY ckey
                ORDER BY ckey LIMIT 2000""")
    }),

    // Plain-SQL window functions PARTITION BY'd on the clustering key
    // through the SqlDivisionWindow rule: window functions keep every
    // row, so Spark's hashpartitioning Exchange moves the WHOLE input
    // — at 100 TB the shuffle IS the query. Here each contiguous key
    // range sorts and evaluates its own partitions in one task, zero
    // Exchange (top-2 orders per customer, the classic dedup/top-k
    // pipeline shape).
    "q_sql_division_window" -> ((s, d) => {
      val oDir = jdOrdersFixture(s, d)
      val s2 = s.newSession()
      // bench-scale fixtures sit under the rewrite's cost-model byte
      // floor (default DivisionRewriteSupport.divisionMinBytes, 1 GiB — always clear at warehouse scale);
      // pin it down so the oracle exercises the division plan
      s2.conf.set("spark.graft.sql.divisionMinBytes", "0")
      s2.read.format("graft").load(oDir).createOrReplaceTempView("sdw_o")
      s2.sql("""SELECT ckey, okey, rk FROM (
                  SELECT ckey, o_orderkey AS okey,
                         row_number() OVER (PARTITION BY ckey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rk
                  FROM sdw_o)
                WHERE rk <= 2
                ORDER BY ckey, rk LIMIT 2000""")
    }),

    // Plain-SQL global ORDER BY in the clustering order through the
    // SqlDivisionSort rule: the RangePartitioning Exchange plus its
    // sampling pass — two passes over a 100 TB table to recreate an
    // order the sidecar already guarantees — become locally sorted
    // range slices concatenated in range order; with LIMIT the plan
    // reads only the FIRST key band's files and stops.
    "q_sql_division_sort" -> ((s, d) => {
      val oDir = jdOrdersFixture(s, d)
      val s2 = s.newSession()
      // bench-scale fixtures sit under the rewrite's cost-model byte
      // floor (default DivisionRewriteSupport.divisionMinBytes, 1 GiB — always clear at warehouse scale);
      // pin it down so the oracle exercises the division plan
      s2.conf.set("spark.graft.sql.divisionMinBytes", "0")
      s2.read.format("graft").load(oDir).createOrReplaceTempView("sds_o")
      s2.sql("""SELECT ckey, o_orderkey, o_totalprice
                FROM sds_o ORDER BY ckey, o_orderkey LIMIT 5000""")
    }),

    // ORDER BY ... DESC through the reversed division tiling:
    // "latest N" on a time/key-clustered table — arguably the most
    // common interactive query — reads the TOP key band's files and
    // stops instead of re-sorting the world (slices union high-to-
    // low, each locally sorted DESC NULLS LAST, Spark's DESC
    // default = the exact reverse of the clustering order).
    "q_sql_division_sort_desc" -> ((s, d) => {
      val oDir = jdOrdersFixture(s, d)
      val s2 = s.newSession()
      // bench-scale fixtures sit under the rewrite's cost-model byte
      // floor (default DivisionRewriteSupport.divisionMinBytes,
      // 1 GiB); pin it down so the oracle exercises the division plan
      s2.conf.set("spark.graft.sql.divisionMinBytes", "0")
      s2.read.format("graft").load(oDir).createOrReplaceTempView("sdsd_o")
      s2.sql("""SELECT ckey, o_orderkey, o_totalprice
                FROM sdsd_o ORDER BY ckey DESC, o_orderkey DESC
                LIMIT 5000""")
    }),

    "q_join_left" -> ((s, d) => {
      val o = scan(s, d, "orders").rename(Map("o_orderkey" -> "okey"))
        .reindex(Seq("okey"))
      val li = scan(s, d, "lineitem").rename(Map("l_orderkey" -> "okey"))
        .reindex(Seq("okey"))
      o.join(li, "left").toDF
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), count(col("l_quantity")).as("n_matched"))
        .orderBy("o_orderpriority")
    }),

    "q_join_full" -> ((s, d) => {
      val li = scan(s, d, "lineitem").rename(Map("l_orderkey" -> "okey"))
        .reindex(Seq("okey"))
      val o = scan(s, d, "orders").rename(Map("o_orderkey" -> "okey"))
        .reindex(Seq("okey"))
      li.join(o, "full").toDF.agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("only_orders"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("only_lineitem"))
    }),

    // -- relational surface (the map/delegation layer) --
    "q1_agg" -> ((s, d) =>
      scan(s, d, "lineitem").toDF
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_window_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
      scan(s, d, "lineitem").toDF
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("l_returnflag", "rn", "l_orderkey", "l_linenumber",
          "l_extendedprice")
        .orderBy("l_returnflag", "rn")
    }),

    "q_window_running" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      scan(s, d, "lineitem").toDF
        .filter(col("l_suppkey") <= 3)
        .withColumn("running_qty", round(sum("l_quantity").over(w), 2))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),

    "q_window_lag" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      scan(s, d, "orders").toDF
        .filter(col("o_custkey") <= 20)
        .withColumn("prev_price", lag("o_totalprice", 1).over(w))
        .withColumn("next_key", lead("o_orderkey", 1).over(w))
        .withColumn("quartile", ntile(4).over(w))
        .select("o_custkey", "o_orderkey", "prev_price", "next_key",
          "quartile")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // GROUPING SETS through the same partial-agg expand as
    // rollup/cube; explicit sets keep the expand factor at 2.
    "q_grouping_sets" -> ((s, d) => {
      val li = scan(s, d, "lineitem").toDF
      li.createOrReplaceTempView("li_gs")
      s.sql("""SELECT l_returnflag, l_linestatus,
                      round(sum(l_quantity), 2) AS qty
               FROM li_gs
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
               ORDER BY l_returnflag ASC NULLS FIRST,
                        l_linestatus ASC NULLS FIRST""")
    }),

    "q_except_all" -> ((s, d) =>
      scan(s, d, "customer").toDF.select(col("c_nationkey").as("nationkey"))
        .exceptAll(scan(s, d, "supplier").toDF
          .select(col("s_nationkey").as("nationkey")))
        .groupBy("nationkey").agg(count(lit(1)).as("n"))
        .orderBy("nationkey")),

    "q_distinct" -> ((s, d) =>
      scan(s, d, "lineitem").toDF
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    "q_rollup" -> ((s, d) =>
      scan(s, d, "lineitem").toDF
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // Z-order clustered layout: write lineitem clustered on
    // (l_partkey, l_suppkey), read back through the per-file stats
    // index, and run a two-sided range scan — files prune on BOTH
    // columns at plan time (LayoutSpec counts them). The answer is
    // layout-independent, so plain SQL is the oracle.
    "q_zorder" -> ((s, d) => {
      val dir = fixture("zorder", d) { out =>
        graft.operators.Layout.zorderWrite(
          scan(s, d, "lineitem").toDF
            .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity"),
          out, Seq("l_partkey", "l_suppkey"), targetFiles = 16, bits = 8)
      }
      graft.operators.Layout.zorderRead(s, dir)
        .filter(col("l_partkey") <= 100 && col("l_suppkey") <= 10)
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
    }),

    // Pivot with explicit value list: no extra distinct-values job,
    // one partial-agg shuffle — same plan shape as a plain groupBy.
    "q_pivot" -> ((s, d) =>
      scan(s, d, "lineitem").toDF
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_quantity"), 2))
        .orderBy("l_returnflag")),

    "q_cube" -> ((s, d) =>
      scan(s, d, "lineitem").toDF
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    "q_intersect" -> ((s, d) =>
      scan(s, d, "customer").toDF.select(col("c_nationkey").as("nationkey"))
        .intersect(scan(s, d, "supplier").toDF
          .select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    "q_except" -> ((s, d) =>
      scan(s, d, "customer").toDF.select(col("c_nationkey").as("nationkey"))
        .except(scan(s, d, "supplier").toDF
          .select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    "q_scalar_fns" -> ((s, d) =>
      scan(s, d, "orders").toDF.select(
        col("o_orderkey"),
        upper(col("o_orderstatus")).as("status_u"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        (col("o_totalprice") * 1.1).as("adj_price"),
        length(col("o_orderpriority")).as("prio_len"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"))
        .orderBy("o_orderkey")),

    "q_topk" -> ((s, d) =>
      scan(s, d, "lineitem").toDF
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(100)),

    "q_sample_det" -> ((s, d) =>
      lineitemOrdered(
        scan(s, d, "lineitem").toDF.filter(col("l_orderkey") % 97 === 0))),

    // Exact-k deterministic sample: order by an md5-derived key and
    // take k. Plans as TakeOrderedAndProject (per-partition top-k +
    // driver merge of k rows per partition) — no global sort, no
    // full shuffle, so the same query shape holds at any corpus
    // size. The md5 key makes the chosen set a pure function of row
    // ids: reproducible across runs, engines and partitionings.
    "q_sample_exact_k" -> ((s, d) =>
      scan(s, d, "orders").toDF
        .orderBy(md5(col("o_orderkey").cast("string")))
        .limit(500)
        .orderBy("o_orderkey")),

    // Per-source quota cap: at most 10 documents per source, chosen
    // by md5 order of doc_id — deterministic across engines, so the
    // same QUALIFY-style SQL is an exact oracle. One shuffle on the
    // group key.
    "q_quota_cap" -> ((s, d) =>
      graft.operators.Sampling.quotaCap(
        s.read.parquet(T(d, "documents")), "source", "doc_id", 10)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")),

    // Context-window chunking: overlapping 200-char chunks (50
    // overlap), offsets preserved. Narrow explode, no shuffle; DuckDB
    // rederives with generate_series + substr.
    "q_chunk" -> ((s, d) =>
      graft.operators.Chunking.chunk(
        s.read.parquet(T(d, "documents")), "text",
        chunkChars = 200, overlap = 50)
        .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
          col("chunk"))
        .orderBy("doc_id", "chunk_id")),

    // One-pass column profile (ANALYZE TABLE): every column's count/
    // nulls/distinct/min/max in a single scan. exact=true here for
    // the oracle; production uses the HLL variant.
    "q_profile" -> ((s, d) =>
      graft.operators.Profile.describe(
        s.read.parquet(T(d, "documents")), exact = true)
        .orderBy("column")),

    // Document rarity vs the corpus's own unigram counts — exact
    // integer aggregates (engine-portable), from which float quality
    // scores derive.
    "q_token_rarity" -> ((s, d) =>
      graft.operators.Rarity.tokenRarity(
        s.read.parquet(T(d, "documents")), "doc_id", "text")
        .orderBy("doc_id")),

    // Heavy hitters without a whole-domain groupBy: Misra-Gries
    // candidates (≤ capacity counters per task, tree-merged) + exact
    // recount of candidates only. minCount sits above the sketch
    // error bound n/capacity by construction, so the answer is EXACT
    // — the plain GROUP BY ... HAVING is the oracle.
    "q_heavy_hitters" -> ((s, d) => {
      val li = scan(s, d, "lineitem").toDF
      val n = li.count()
      val minCount = math.max(30L, math.ceil(2.0 * n / 4096).toLong)
      graft.operators.Frequency.heavyHitters(li, "l_partkey", minCount)
        .orderBy(col("n").desc, col("l_partkey"))
    }),

    // TPC-H Q5 shape: a six-table star join. The three small
    // dimensions broadcast (no shuffle); the customer⋈orders⋈lineitem
    // spine shuffles on its keys with partial aggregation — the plan
    // a 100 TB fact table needs (PlanSpec pins the dimension
    // broadcasts and the partial aggregate for this query).
    "q_tpch_q5" -> ((s, d) => {
      val c = scan(s, d, "customer").toDF
      val o = scan(s, d, "orders").toDF
      val l = scan(s, d, "lineitem").toDF
      val su = scan(s, d, "supplier").toDF
      val n = scan(s, d, "nation").toDF
      val r = scan(s, d, "region").toDF.filter(col("r_name") === "ASIA")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q4 shape (order-priority checking): the correlated
    // EXISTS — here with a NON-equi correlated predicate (a line
    // shipped > 60 days after its order's date) — is a LEFT SEMI
    // join carrying the extra condition, so lineitem never widens
    // the row and each order is counted once however many late
    // lines it has. The date window filters orders BEFORE the join,
    // so the shuffled semi-join probe side is ~4% of orders.
    "q_tpch_q4" -> ((s, d) => {
      val o = scan(s, d, "orders").toDF
        .filter(col("o_orderdate") >= lit(ldt("1996-01-01T00:00")) &&
          col("o_orderdate") < lit(ldt("1996-04-01T00:00")))
      val l = scan(s, d, "lineitem").toDF
        .select("l_orderkey", "l_shipdate")
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q14 shape (promo revenue): conditional aggregation — the
    // promo and total revenues come out of ONE pass over the joined
    // month of lineitem, never two scans. Exact integer cents (see
    // Q10) make the ratio bit-identical across engines.
    "q_tpch_q14" -> ((s, d) => {
      val l = scan(s, d, "lineitem").toDF
        .filter(col("l_shipdate") >= lit(ldt("1996-01-01T00:00")) &&
          col("l_shipdate") < lit(ldt("1996-02-01T00:00")))
      val p = scan(s, d, "part").toDF.select("p_partkey", "p_type")
      val cents = round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", cents).otherwise(0L)) /
          sum(cents)).as("promo_revenue_pct"))
    }),

    // TPC-H Q10 shape (returned-item revenue): the quarter window
    // filters orders and the returnflag filters lineitem BEFORE the
    // spine join, nation broadcasts onto the customer side, and the
    // per-customer revenue ranking is a TakeOrderedAndProject top-20
    // (never a global sort). Group keys include the unique customer
    // key, so the order is fully deterministic.
    "q_tpch_q10" -> ((s, d) => {
      val c = scan(s, d, "customer").toDF
      val o = scan(s, d, "orders").toDF
        .filter(col("o_orderdate") >= lit(ldt("1996-01-01T00:00")) &&
          col("o_orderdate") < lit(ldt("1996-04-01T00:00")))
      val l = scan(s, d, "lineitem").toDF
        .filter(col("l_returnflag") === "R")
      val n = scan(s, d, "nation").toDF
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        // prices and discounts are cent-exact: summing integer
        // (cents × discount-percent) keeps the revenue EXACT, so the
        // top-20 boundary can never flip on float accumulation order
        .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
            round((lit(1) - col("l_discount")) * 100).cast("long")) /
          lit(10000.0)).as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 shape (large-volume customers): a HAVING-filtered
    // aggregate over the fact spine feeds an IN-subquery — expressed
    // as a LEFT SEMI join so the big-orders key set never widens the
    // row, then the customer dim broadcasts onto the shuffled
    // orders⋈lineitem spine and re-aggregates. TopK via
    // TakeOrderedAndProject, not a global sort.
    "q_tpch_q18" -> ((s, d) => {
      val c = scan(s, d, "customer").toDF
      val o = scan(s, d, "orders").toDF
      val l = scan(s, d, "lineitem").toDF
      val big = l.groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"))
        .filter(col("q") > 300)
        .select(col("l_orderkey").as("bigkey"))
      o.join(big, col("o_orderkey") === col("bigkey"), "left_semi")
        .join(c, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "o_totalprice")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"),
          col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // scalar subquery (avg quantity per part) decorrelates into a
    // per-part aggregate joined back. The brand filter broadcasts
    // onto lineitem FIRST, so both the aggregate and the probe side
    // scan only the brand's rows — never all of lineitem twice.
    // l_quantity is integral, so the avg is an exact integer/count
    // division and the 20% threshold is bit-identical across engines.
    "q_tpch_q17" -> ((s, d) => {
      val p = scan(s, d, "part").toDF
        .filter(col("p_brand") === "Brand#13").select("p_partkey")
      val l = scan(s, d, "lineitem").toDF
      val lp = l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val lim = lp.groupBy("p_partkey")
        .agg((avg("l_quantity") * 0.2).as("lim"))
        .withColumnRenamed("p_partkey", "lim_partkey")
      lp.join(broadcast(lim), col("p_partkey") === col("lim_partkey"))
        .filter(col("l_quantity") < col("lim"))
        .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
    }),

    // TPC-H Q21 shape (suppliers who alone held up multi-supplier
    // orders; "late" adapted to shipdate > orderdate + 60 days since
    // the synthetic lineitem has no receipt/commit dates). The two
    // correlated EXISTS / NOT EXISTS decorrelate into ONE pass:
    // lineitem is scanned once into a per-(order, supplier) lateness
    // aggregate (map-side partial), then a window over the order
    // counts suppliers and late suppliers — a late supplier waits
    // alone iff nsupp >= 2 and nlate == 1. TopK via
    // TakeOrderedAndProject; the supplier dim broadcasts.
    "q_tpch_q21" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sup = scan(s, d, "supplier").toDF
      val o = scan(s, d, "orders").toDF
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val l = scan(s, d, "lineitem").toDF
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val perSupp = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          1).otherwise(0)).as("supp_late"))
      val w = Window.partitionBy("l_orderkey")
      perSupp
        .withColumn("nsupp", count(lit(1)).over(w))
        .withColumn("nlate", sum("supp_late").over(w))
        .filter(col("supp_late") === 1 &&
          col("nsupp") >= 2 && col("nlate") === 1)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // TPC-H Q13 shape (customer order-count distribution): the
    // classic outer-join-then-count — customers with no (qualifying)
    // orders MUST appear with c_count 0, so the priority exclusion
    // lives in the JOIN CONDITION, never a WHERE (a WHERE would drop
    // the very customers the distribution exists to count). The
    // first aggregate reuses the join's hash partitioning on the
    // customer key (zero extra shuffle); the second aggregate is
    // over ≤ a few hundred distinct counts. count(o_orderkey)
    // counts non-null only, so unmatched left rows land in bucket 0.
    "q_tpch_q13" -> ((s, d) => {
      val c = scan(s, d, "customer").toDF.select("c_custkey")
      val o = scan(s, d, "orders").toDF
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey", "o_orderkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q20 shape (dominant suppliers of small parts; partsupp
    // availability adapted to shipment share since the synthetic
    // schema has no partsupp): the nested IN-over-an-aggregate-
    // threshold chain — part names → lineitem semi, the correlated
    // per-(supplier, part) vs per-part totals, nation → supplier
    // semi — decorrelates into ONE lineitem pass: the part filter
    // broadcasts as a semi join BEFORE the aggregate, the per-part
    // total comes from a window over the per-pair aggregate (never a
    // second scan), and both supplier-side reductions are semi
    // joins, so nothing widens and there is no nested loop.
    "q_tpch_q20" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val p = scan(s, d, "part").toDF
        .filter(col("p_name").startsWith("small")).select("p_partkey")
      val l = scan(s, d, "lineitem").toDF
        .filter(col("l_shipdate") >= lit(ldt("1996-01-01T00:00")) &&
          col("l_shipdate") < lit(ldt("1997-01-01T00:00")))
        .select("l_suppkey", "l_partkey", "l_quantity")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"),
          "left_semi")
      val pairs = l.groupBy("l_suppkey", "l_partkey")
        .agg(sum("l_quantity").as("q96"))
      val dominant = pairs
        .withColumn("qt",
          sum("q96").over(Window.partitionBy("l_partkey")))
        .filter(col("q96") > lit(0.5) * col("qt"))
        .select("l_suppkey")
      val natSup = scan(s, d, "supplier").toDF
        .join(broadcast(scan(s, d, "nation").toDF
            .filter(col("n_regionkey") === 1)),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
      natSup.join(dominant, col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q6 shape (forecast revenue change): the canonical
    // scan-filter-aggregate — every predicate (date window, discount
    // band, quantity cap) must reach the parquet scan as a pushed
    // filter, and the whole query is one partial+final aggregate
    // with no shuffle of data rows. Exact integer cents (price ×
    // discount-percent) keep the sum bit-identical across engines.
    "q_tpch_q6" -> ((s, d) =>
      scan(s, d, "lineitem").toDF
        .filter(col("l_shipdate") >= lit(ldt("1996-01-01T00:00")) &&
          col("l_shipdate") < lit(ldt("1997-01-01T00:00")) &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
          col("l_quantity") < 24)
        .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
            round(col("l_discount") * 100).cast("long")) / lit(10000.0))
          .as("revenue"))),

    // TPC-H Q7 shape (volume shipping between two nations): the
    // nation pair filters BOTH dimension sides before the fact join —
    // supplier⋈nation and customer⋈nation broadcast-reduce to the two
    // nations (~8% of each side), so lineitem is cut by a broadcast
    // semi-equi join before the orders shuffle, and the asymmetric
    // pair condition ((A,B) or (B,A)) rides the final join output.
    "q_tpch_q7" -> ((s, d) => {
      val nations = Seq("NATION_1", "NATION_2")
      val n1 = scan(s, d, "nation").toDF
        .filter(col("n_name").isin(nations: _*))
        .select(col("n_nationkey").as("n1key"),
          col("n_name").as("supp_nation"))
      val n2 = scan(s, d, "nation").toDF
        .filter(col("n_name").isin(nations: _*))
        .select(col("n_nationkey").as("n2key"),
          col("n_name").as("cust_nation"))
      val sup = scan(s, d, "supplier").toDF
        .join(broadcast(n1), col("s_nationkey") === col("n1key"))
        .select("s_suppkey", "supp_nation")
      val cust = scan(s, d, "customer").toDF
        .join(broadcast(n2), col("c_nationkey") === col("n2key"))
        .select("c_custkey", "cust_nation")
      val l = scan(s, d, "lineitem").toDF
        .filter(col("l_shipdate") >= lit(ldt("1995-01-01T00:00")) &&
          col("l_shipdate") < lit(ldt("1997-01-01T00:00")))
      val o = scan(s, d, "orders").toDF.select("o_orderkey", "o_custkey")
      l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
            round((lit(1) - col("l_discount")) * 100).cast("long")) /
          lit(10000.0)).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q15 shape (top supplier): the revenue view is used twice
    // (per-supplier revenues, and their maximum). The maximum is a
    // one-row broadcast cross join — NEVER a global single-partition
    // window, which would funnel every supplier through one task at
    // scale. Exact integer cents make the max-equality tie-safe.
    "q_tpch_q15" -> ((s, d) => {
      def revenue = scan(s, d, "lineitem").toDF
        .filter(col("l_shipdate") >= lit(ldt("1996-01-01T00:00")) &&
          col("l_shipdate") < lit(ldt("1996-04-01T00:00")))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          round((lit(1) - col("l_discount")) * 100).cast("long"))
          .as("total_cents"))
      val mx = revenue.agg(max("total_cents").as("mx"))
      scan(s, d, "supplier").toDF
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .crossJoin(broadcast(mx))
        .filter(col("total_cents") === col("mx"))
        .select(col("s_suppkey"), col("s_name"),
          (col("total_cents") / lit(10000.0)).as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q16 shape (supplier relationship count): the NOT IN
    // exclusion is a broadcast ANTI join (the excluded supplier set
    // is tiny), the part attribute filter broadcasts onto lineitem,
    // and count(DISTINCT supplier) runs as Spark's two-phase
    // distinct aggregate — partial per-partition dedup before the
    // shuffle, never a row-per-duplicate shuffle.
    "q_tpch_q16" -> ((s, d) => {
      val excl = scan(s, d, "supplier").toDF
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      val p = scan(s, d, "part").toDF
        .filter(col("p_brand") =!= "Brand#13" &&
          col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      scan(s, d, "lineitem").toDF.select("l_partkey", "l_suppkey")
        .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"),
          col("p_type"), col("p_size"))
    }),

    // TPC-H Q19 shape (discounted revenue, disjunctive predicate):
    // the OR-of-ANDs join. The equi key (partkey) carries the hash
    // join; the disjunction rides as the join residual. Each side is
    // ALSO pre-filtered with the union of its disjunct ranges
    // (brand∈{12,23,34} ∧ size≤15 on part; 1≤qty≤30 on lineitem) —
    // the implied-predicate extraction that keeps the probe stream
    // small — and the plan must never degrade to a nested loop.
    "q_tpch_q19" -> ((s, d) => {
      val p = scan(s, d, "part").toDF
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
          col("p_size") >= 1 && col("p_size") <= 15)
        .select("p_partkey", "p_brand", "p_size")
      val l = scan(s, d, "lineitem").toDF
        .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
        .select("l_partkey", "l_quantity", "l_extendedprice",
          "l_discount")
      val leg1 = col("p_brand") === "Brand#12" &&
        col("p_size") <= 5 && col("l_quantity") <= 11
      val leg2 = col("p_brand") === "Brand#23" &&
        col("p_size") <= 10 &&
        col("l_quantity") >= 10 && col("l_quantity") <= 20
      val leg3 = col("p_brand") === "Brand#34" &&
        col("l_quantity") >= 20
      l.join(broadcast(p),
          col("l_partkey") === col("p_partkey") && (leg1 || leg2 || leg3))
        .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
            round((lit(1) - col("l_discount")) * 100).cast("long")) /
          lit(10000.0)).as("revenue"))
    }),

    // TPC-H Q22 shape (global sales opportunity): customers above
    // the positive-balance average with no RECENT orders (the
    // original's 7-year dormancy window — every synthetic customer
    // has SOME order). The scalar average broadcasts as a one-row
    // (sum, count) pair and the comparison is exact integer
    // cross-multiplication (cents × count > total-cents), so no
    // float-average boundary row can flip between engines; the
    // dormancy test is an ANTI join against the date-filtered
    // orders, shuffled on the customer key.
    "q_tpch_q22" -> ((s, d) => {
      val cust = scan(s, d, "customer").toDF
        .filter(col("c_nationkey") <= 7)
        .select(col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      val pos = cust.filter(col("bal_cents") > 0)
        .agg(sum("bal_cents").as("pos_sum"),
          count(lit(1)).as("pos_cnt"))
      val recent = scan(s, d, "orders").toDF
        .filter(col("o_orderdate") >= lit(ldt("2000-01-01T00:00")))
        .select("o_custkey")
      cust.crossJoin(broadcast(pos))
        .filter(col("bal_cents") * col("pos_cnt") > col("pos_sum"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          (sum("bal_cents") / lit(100.0)).as("totacctbal"))
        .orderBy("cntrycode")
    }),

    // TPC-H Q2 shape (min-cost supplier per part; supply cost adapted
    // to supplier account balance — no partsupp in the synthetic
    // schema): the correlated min subquery decorrelates into a
    // per-part aggregate joined back on (partkey, min) equality. The
    // candidate set is reduced FIRST (part attribute filter + region
    // suppliers, both broadcast), so the min and the probe run over
    // the same small pre-joined set — the fact table contributes only
    // the distinct (part, supplier) relationship.
    "q_tpch_q2" -> ((s, d) => {
      val shipped = scan(s, d, "lineitem").toDF
        .select("l_partkey", "l_suppkey").distinct()
      val rsupp = scan(s, d, "supplier").toDF
        .join(broadcast(scan(s, d, "nation").toDF
            .filter(col("n_regionkey") === 1)),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val p = scan(s, d, "part").toDF
        .filter(col("p_size") <= 3 && col("p_type") === "SMALL")
        .select("p_partkey", "p_brand")
      val scored = shipped
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(rsupp), col("l_suppkey") === col("s_suppkey"))
      val minb = scored.groupBy(col("p_partkey").as("mk"))
        .agg(min("s_acctbal").as("min_bal"))
      scored.join(minb, col("p_partkey") === col("mk") &&
          col("s_acctbal") === col("min_bal"))
        .select("p_partkey", "p_brand", "s_name", "s_acctbal", "n_name")
        .orderBy(col("s_acctbal"), col("s_name"), col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q8 shape (national market share): the share is two
    // conditional sums out of ONE pass over the filtered join — never
    // two scans — and the ratio divides exact integer cents, rounded
    // once at the end. Part-type and region filters broadcast-reduce
    // the fact stream before the orders shuffle.
    "q_tpch_q8" -> ((s, d) => {
      val cents = round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")
      val p = scan(s, d, "part").toDF
        .filter(col("p_type") === "ECONOMY").select("p_partkey")
      val supN = scan(s, d, "supplier").toDF
        .join(broadcast(scan(s, d, "nation").toDF
            .select(col("n_nationkey").as("snk"),
              col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
        .select("s_suppkey", "supp_nation")
      val custAmerica = scan(s, d, "customer").toDF
        .join(broadcast(scan(s, d, "nation").toDF
            .join(broadcast(scan(s, d, "region").toDF
                .filter(col("r_name") === "AMERICA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey").as("cnk"))),
          col("c_nationkey") === col("cnk"))
        .select("c_custkey")
      val o = scan(s, d, "orders").toDF
        .filter(col("o_orderdate") >= lit(ldt("1995-01-01T00:00")) &&
          col("o_orderdate") < lit(ldt("1997-01-01T00:00")))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      scan(s, d, "lineitem").toDF
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(custAmerica, col("o_custkey") === col("c_custkey"),
          "left_semi")
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", cents)
            .otherwise(0L)) * lit(1.0) / sum(cents), 6)
          .as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 shape (product-type profit; supply cost adapted to a
    // deterministic 60% of retail price — no partsupp): profit per
    // line is exact integer arithmetic at the same 1e-4 scale as the
    // revenue cents, so the grouped sums are bit-identical across
    // engines. The name filter broadcasts onto lineitem; supplier
    // nation broadcasts; only the orders join shuffles.
    "q_tpch_q9" -> ((s, d) => {
      val revCents = round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")
      val costCents = round(col("p_retailprice") * 100).cast("long") *
        round(col("l_quantity")).cast("long") * lit(60L)
      val p = scan(s, d, "part").toDF
        .filter(col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
      val supN = scan(s, d, "supplier").toDF
        .join(broadcast(scan(s, d, "nation").toDF
            .select(col("n_nationkey").as("snk"), col("n_name"))),
          col("s_nationkey") === col("snk"))
        .select("s_suppkey", "n_name")
      val o = scan(s, d, "orders").toDF
        .select("o_orderkey", "o_orderdate")
      scan(s, d, "lineitem").toDF
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(revCents - costCents) / lit(10000.0)).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q11 shape (important stock; partsupp value adapted to
    // shipped volume of two nations' suppliers): group sums compared
    // against a fraction of their own grand total. The threshold is
    // a one-row broadcast, and the 0.2% fraction compares by exact
    // integer cross-multiplication (value × 500 > total) — no float
    // threshold can flip a boundary part between engines. The
    // grouped view is a val, so both consumers share ONE analyzed
    // subtree (same expression ids) and the per-part aggregate's
    // shuffle is structurally reused (ReusedExchange — pinned in
    // PlanSpec) instead of recomputed for the total.
    "q_tpch_q11" -> ((s, d) => {
      val cents = round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")
      val supN = scan(s, d, "supplier").toDF
        .join(broadcast(scan(s, d, "nation").toDF
            .filter(col("n_name").isin("NATION_3", "NATION_4"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val v = scan(s, d, "lineitem").toDF
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"),
          "left_semi")
        .groupBy("l_partkey")
        .agg(sum(cents).as("value_cents"))
      val total = v.agg(sum("value_cents").as("total_cents"))
      v.crossJoin(broadcast(total))
        .filter(col("value_cents") * 500 > col("total_cents"))
        .select(col("l_partkey"),
          (col("value_cents") / lit(10000.0)).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    // TPC-H Q12 shape (late-line priority accounting; shipmode
    // adapted to linestatus — the synthetic lineitem has no
    // l_shipmode): both priority classes come out of ONE pass as
    // conditional counts; the year window pushes to the lineitem
    // scan and the lateness test (shipdate vs its own order's date)
    // is a post-join filter on the orderkey equi join.
    "q_tpch_q12" -> ((s, d) => {
      val o = scan(s, d, "orders").toDF
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      scan(s, d, "lineitem").toDF
        .filter(col("l_shipdate") >= lit(ldt("1996-01-01T00:00")) &&
          col("l_shipdate") < lit(ldt("1997-01-01T00:00")))
        .select("l_orderkey", "l_linestatus", "l_shipdate")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    "q_tpch_q3" -> ((s, d) => {
      val c = scan(s, d, "customer").toDF.filter(col("c_mktsegment") === "BUILDING")
      val o = scan(s, d, "orders").toDF
      val l = scan(s, d, "lineitem").toDF
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // -- beyond-parity join surface: semi/anti + temporal joins --
    "q_join_semi" -> ((s, d) =>
      scan(s, d, "customer").toDF
        .join(scan(s, d, "orders").toDF,
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    "q_join_anti" -> ((s, d) =>
      scan(s, d, "customer").toDF
        .join(scan(s, d, "orders").toDF,
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    // Salted (skew-safe) join: row-identical to the plain equi-join,
    // so the oracle is the ordinary SQL join — the salting is pure
    // physical-plan insurance for hot keys.
    "q_join_salted" -> ((s, d) => {
      val li = scan(s, d, "lineitem").toDF
      val o = scan(s, d, "orders").toDF
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.Skew.saltedJoin(li, o, Seq("l_orderkey"), salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    // HLL sketch contract: mergeable approximate-distinct sketches are
    // the 100 TB way to count uniques; the oracle carries the EXACT
    // per-group distinct counts, and the query asserts its own sketch
    // estimates land within 5% by emitting the exact counts + flag.
    "q_sketch_hll" -> ((s, d) => {
      val li = scan(s, d, "lineitem").toDF
      val sketched = li.groupBy("l_returnflag")
        .agg(hll_sketch_estimate(
          hll_sketch_agg(col("l_orderkey"))).as("approx_n"))
      val exact = li.groupBy("l_returnflag")
        .agg(count_distinct(col("l_orderkey")).as("exact_n"))
      sketched.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_n"),
          (abs(col("approx_n") - col("exact_n")).cast("double") <=
            col("exact_n") * 0.05).as("within_5pct"))
        .orderBy("l_returnflag")
    }),

    // PQ compresses each vector to m per-subspace centroid codes and
    // scans codes, not floats; recall graded against the exact L2
    // baseline with the same thresholded contract as LSH/IVF.
    "q_ann_pq" -> ((s, d) => {
      val emb = scan(s, d, "embeddings").toDF
      val q = emb.filter(col("vec_id") < 10)
      // Measured recall@5: 0.34 at both sf0.01 and sf0.1 (random
      // near-orthogonal vectors are PQ's worst case) — floor 0.25.
      recallContract(
        Similarity.pqTopK(q, emb, "vec_id", "embedding",
          k = 5, dim = 64, m = 16, ksub = 32),
        Similarity.bruteForceL2TopK(q, emb, "vec_id", "embedding", k = 5),
        floor = 0.25)
    }),

    // BM25 relevance over the documents corpus for a fixed query —
    // the retrieval scorer a training-data pipeline runs at corpus
    // scale. Exact DuckDB rederivation (same formula, same rounding).
    "q_bm25" -> ((s, d) => {
      val docs = scan(s, d, "documents").toDF
      val terms = Seq("spark", "join", "window")
      val k1 = 1.2
      val b = 0.75
      val toks = docs.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
        .filter(col("term").isin(terms: _*))
      val dl = docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("double").as("dl"))
      val stats = dl.agg(avg(col("dl")).as("avgdl"),
        count(lit(1)).cast("double").as("n"))
      val tf = toks.groupBy("doc_id", "term")
        .agg(count(lit(1)).cast("double").as("tf"))
      val dfreq = toks.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      tf.join(broadcast(dfreq), Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("w", col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
        .groupBy("doc_id").agg(round(sum(col("w")), 4).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(100)
    }),

    // Approx-percentile contract (the q_sketch_hll pattern): mergeable
    // percentile sketches are the 100 TB way to rank — the oracle
    // carries the EXACT quantiles and the query asserts its own
    // approx_percentile estimates land within 1% of them.
    "q_sketch_percentile" -> ((s, d) => {
      val li = scan(s, d, "lineitem").toDF
      val approx = li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.95)), lit(10000)).as("ap"))
      val exact = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.5D, 0.95D))").as("ex"))
      // Portable cent rounding: floor(x*100 + 0.5)/100 is pure IEEE
      // arithmetic, identical in any engine given the same double —
      // round(x, 2) is NOT (Spark rounds the exact binary expansion
      // via BigDecimal HALF_UP; DuckDB rounds through a multiply),
      // and the two disagree exactly at cent boundaries, which the
      // regenerated testdata occasionally hits (the meanPool lesson).
      // The oracle mirrors this formula and re-derives the exact
      // percentile with Spark's own interpolation arithmetic.
      def cents(c: org.apache.spark.sql.Column) =
        floor(c * 100 + lit(0.5)) / 100
      approx.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          cents(element_at(col("ex"), 1)).as("p50_exact"),
          cents(element_at(col("ex"), 2)).as("p95_exact"),
          (abs(element_at(col("ap"), 1) - element_at(col("ex"), 1)) <=
            element_at(col("ex"), 1) * 0.01 &&
           abs(element_at(col("ap"), 2) - element_at(col("ex"), 2)) <=
            element_at(col("ex"), 2) * 0.01).as("within_1pct"))
        .orderBy("l_returnflag")
    }),

    "q_asof_join" -> ((s, d) => {
      val ev = eventsDF(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("value").as("last_purchase_value"),
          col("event_id").as("last_purchase_event"))
      graft.operators.TemporalJoins.asofJoin(
        ev.select("event_id", "user_id", "ts", "event_type"),
        purchases, Seq("user_id"), "ts")
        .select("event_id", "user_id", "event_type",
          "last_purchase_value", "last_purchase_event")
        .orderBy("event_id")
    }),

    "q_range_join" -> ((s, d) => {
      val ev = eventsDF(s, d)
      val outages = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
      graft.operators.TemporalJoins.rangeJoin(
        ev.select("event_id", "user_id", "ts"),
        "ts", outages, "w_start", "w_end", Seq("user_id"),
        bucketWidthMicros = 600L * 1000000L)
        .groupBy("user_id")
        .agg(count_distinct(col("event_id")).as("n_affected"))
        .orderBy("user_id")
    }),

    // -- event-time analytics --
    "q_events_tumbling" -> ((s, d) =>
      Events.tumblingCounts(eventsDF(s, d))
        .orderBy("window_start", "event_type")),

    "q_events_sliding" -> ((s, d) =>
      Events.slidingCounts(eventsDF(s, d))
        .orderBy("window_start", "event_type")),

    "q_events_sessions" -> ((s, d) =>
      Events.sessionStats(eventsDF(s, d), gapMinutes = 30)
        .orderBy("user_id")),

    // -- training-data pipeline: dedup --
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactDedup(scan(s, d, "documents").toDF, "doc_id", "text")
        .orderBy("doc_id")),

    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashNearDupPairs(scan(s, d, "documents").toDF, "doc_id", "text")
        .orderBy("idA", "idB")),

    "q_dedup_ngram" -> ((s, d) =>
      Dedup.ngramJaccardPairs(scan(s, d, "documents").toDF, "doc_id", "text")
        .orderBy("idA", "idB")),

    // The full ingestion decision on the incremental index: batch
    // docs near-duplicating the INDEXED corpus drop (the corpus copy
    // wins), batch-internal pairs drop their larger id, survivors
    // stream through a broadcast anti-join bounded by the dup rate.
    "q_dedup_batch" -> ((s, d) => {
      val idx = fixture("mhidx", d) { out =>
        Dedup.buildMinhashIndex(s,
          scan(s, d, "documents").toDF.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", out)
      }
      val all = scan(s, d, "documents").toDF
      Dedup.dedupBatch(s,
        all.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        all.filter(col("doc_id") % 10 =!= 0), idx)
        .select("doc_id", "text").orderBy("doc_id")
    }),

    // Incremental near-dup against a PERSISTED MinHash band index:
    // the corpus (doc_id % 10 != 0) indexes ONCE; the new batch
    // (doc_id % 10 == 0) computes only its own signatures, equi-joins
    // the index's bucket table, and exact-verifies the hits — at
    // continuous-ingest scale no signature is ever recomputed and
    // old-vs-old is never re-paired. Oracle: the exact-Jaccard pair
    // set restricted to pairs touching the batch.
    "q_dedup_minhash_inc" -> ((s, d) => {
      val idx = fixture("mhidx", d) { out =>
        Dedup.buildMinhashIndex(s,
          scan(s, d, "documents").toDF.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", out)
      }
      val all = scan(s, d, "documents").toDF
      Dedup.incrementalNearDupPairs(s,
        all.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        all.filter(col("doc_id") % 10 =!= 0), idx)
        .orderBy("idA", "idB")
    }),

    // Pairwise near-dup hits become keep/drop decisions here:
    // connected components over the pair graph, canonical survivor =
    // the component's min doc id.
    "q_dedup_clusters" -> ((s, d) => {
      val pairs = Dedup.ngramJaccardPairs(
        scan(s, d, "documents").toDF, "doc_id", "text")
      Dedup.nearDupClusters(pairs).orderBy("doc_id")
    }),

    // end-to-end dedup: pairs -> components -> canonical survivors
    "q_dedup_corpus" -> ((s, d) => {
      val docs = scan(s, d, "documents").toDF
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      Dedup.dedupCorpus(docs, "doc_id", pairs)
        .select("doc_id", "n_chars").orderBy("doc_id")
    }),

    // Quality-keeper dedup: per near-dup cluster keep the HIGHEST-
    // quality member (n_chars here; ties break on the smaller id)
    // instead of the smallest id — "keep the best copy". The ranking
    // window runs over cluster members only, never the whole corpus.
    "q_dedup_quality" -> ((s, d) => {
      val docs = scan(s, d, "documents").toDF
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      Dedup.dedupCorpusByQuality(docs, "doc_id", "n_chars", pairs)
        .select("doc_id", "n_chars").orderBy("doc_id")
    }),

    // ExactSubstr span dedup (Lee et al. 2022, arXiv:2107.06499): a
    // 12-token passage planted on every doc_id % 7 == 0 document,
    // then k=8-token positional shingles -> cross-doc duplicated-
    // shingle aggregate -> per-doc span merge -> cut. The globally
    // smallest planted occurrence keeps the passage (keepFirst);
    // every other copy is excised in place. The shuffle carries
    // 20-byte (hash, start, end) rows, never text.
    "q_dedup_spans" -> ((s, d) =>
      Dedup.dedupSpans(spanPlantedDocs(s, d), "doc_id", "text", k = 8)
        .select("doc_id", "text").orderBy("doc_id")),

    // Provenance audit of the same ExactSubstr run: one row per
    // removed span with the exact excised substring, so curators can
    // reconstruct what dedup cut (original = cut text ∪ audit).
    "q_span_audit" -> ((s, d) =>
      Dedup.spanAudit(spanPlantedDocs(s, d), "doc_id", "text", k = 8)
        .orderBy("doc_id", "span_start")),

    // WITHIN-doc span dedup (self-repetition trim — the generated-
    // text-loop / boilerplate-echo case): a passage planted TWICE in
    // each doc_id % 11 == 0 document keeps its first copy and loses
    // the second; duplication is judged per document, so identical
    // passages across documents are untouched here.
    "q_dedup_spans_self" -> ((s, d) =>
      Dedup.dedupSpans(spanSelfPlantedDocs(s, d), "doc_id", "text",
        k = 8, withinDoc = true)
        .select("doc_id", "text").orderBy("doc_id")),

    // COMPOSED span dedup (the pass a real pipeline runs): self-trim
    // within each document, then cross-doc dedup over the surviving
    // shingles — one operator call, ONE tokenization of the corpus
    // (the plan pin in PipelineOpsSpec counts a single shingle
    // Generate node). %11 docs lose their second in-doc copy of the
    // passage; of every remaining copy corpus-wide exactly the
    // min-(id, start) keeper survives.
    "q_dedup_spans_both" -> ((s, d) =>
      Dedup.dedupSpans(spanBothPlantedDocs(s, d), "doc_id", "text",
        k = 8, alsoWithinDoc = true)
        .select("doc_id", "text").orderBy("doc_id")),

    // INCREMENTAL ExactSubstr: the even documents play the already-
    // ingested corpus (a persisted (hash, id, start) shingle index,
    // clustered on the hash); the odd documents arrive as a new batch
    // and have every span duplicated against the index — or repeated
    // across the batch — cut, with the global min-(id, start) keeper
    // exempt. The batch's cut shingles append to the index
    // afterwards, making ingestion cumulative. Output = the cut
    // batch, which must equal a one-shot dedupSpans over the WHOLE
    // corpus restricted to the odd documents (the oracle reruns the
    // one-shot recipe and filters).
    "q_dedup_spans_inc" -> ((s, d) => {
      // The index over the already-ingested half is a deterministic
      // read-only-seeded fixture, not the operator under test: build
      // it once per process and give each run a fresh mutable copy
      // (dedupSpansBatch appends the batch's cut shingles to it) — the
      // q_stream_ingest / q_forget_reingest discipline. The timed body
      // is the incremental operator: batch shingles + index semi-join
      // + duplication aggregate + span cut + index append.
      val idx = mutableCopy("spanidx8", d) { out =>
        Dedup.buildSpanIndex(s,
          spanPlantedDocs(s, d).filter(col("doc_id") % 2 === 0),
          "doc_id", "text", out, k = 8)
      }
      Dedup.dedupSpansBatch(s,
        spanPlantedDocs(s, d).filter(col("doc_id") % 2 === 1),
        "doc_id", "text", idx)
        .select("doc_id", "text").orderBy("doc_id")
    }),

    // Benchmark decontamination: corpus docs sharing any word 4-gram
    // with the held-out set (doc_id % 97 == 0 plays the eval set).
    // The benchmark's distinct-shingle set broadcasts; the corpus is
    // one narrow scan.
    "q_decontaminate" -> ((s, d) => {
      val docs = scan(s, d, "documents").toDF
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", shingleWords = 4)
        .orderBy("doc_id")
    }),

    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashNearDupPairs(
        scan(s, d, "documents").toDF,
        "doc_id", "text", maxDist = 3)
        .orderBy("idA", "idB")),

    "q_dedup_embedding" -> ((s, d) =>
      Dedup.embeddingNearDupPairs(
        scan(s, d, "embeddings").toDF.filter(col("vec_id") < 2000),
        "vec_id", "embedding", threshold = 0.9)
        .orderBy("idA", "idB")),

    // CCNet-style boilerplate removal: prepend one shared header
    // segment to EVERY document, then drop segments appearing in more
    // than 10 documents — the header vanishes corpus-wide (document
    // frequency = corpus size) while each unique body (frequency 1)
    // survives and reassembles verbatim, so the oracle is the
    // pristine table. One exploded-segment hash aggregate + a
    // broadcast anti-join bounded by the boilerplate rate.
    "q_boilerplate" -> ((s, d) => {
      val docs = scan(s, d, "documents").toDF.select(
        col("doc_id"),
        concat(lit("COMMON BOILERPLATE HEADER\n"), col("text")).as("text"))
      Dedup.dedupSegments(docs, "doc_id", "text", maxDocFreq = 10)
        .select("doc_id", "text").orderBy("doc_id")
    }),

    // SemDeDup (cluster-then-intra-cluster near-dup, arXiv:2303.09540):
    // duplicate the embedding table under shifted ids, dedup at
    // cosine ~ 1.0 — every injected duplicate group collapses to its
    // original (minimum) id and nothing else pairs (random 64-dim
    // vectors never reach the band), so the oracle is the pristine
    // table. The pair join is an equi-join on the trained Voronoi
    // cell — sum of per-cell squares, never N^2/2.
    "q_semdedup" -> ((s, d) => {
      val base = scan(s, d, "embeddings").toDF
        .filter(col("vec_id") < 2000)
        .select("vec_id", "embedding", "label")
      val dupes = base.withColumn("vec_id", col("vec_id") + lit(10000000L))
      Dedup.semDedup(base.unionByName(dupes), "vec_id", "embedding",
        dim = 64, threshold = 0.9999, nClusters = 8)
        .select("vec_id", "label").orderBy("vec_id")
    }),

    // Deletion propagation + re-ingestion: forget every doc_id % 50
    // == 0 document (corpus keyed delete + DV-hidden index bands),
    // then re-ingest exact copies under shifted ids through
    // dedupBatch. Without the forget every copy would match its own
    // ghost bands and drop; with it, copies survive except where they
    // near-dup a LIVE corpus doc or each other — the same loser
    // policy the q_dedup_batch oracle recomputes, shifted.
    "q_forget_reingest" -> ((s, d) => {
      val root = mutableCopy("forgetpair", d) { out =>
        val all = scan(s, d, "documents").toDF.select("doc_id", "text")
        PDataset.fromDataFrame(all, Seq("doc_id"))
          .writeParquet(out + "/corpus")
        Dedup.buildMinhashIndex(s, all, "doc_id", "text", out + "/idx")
      }
      val forgotten = scan(s, d, "documents").toDF
        .filter(col("doc_id") % 50 === 0)
      val ids = forgotten.select("doc_id").collect()
        .map(_.getLong(0)).toSeq
      Dedup.forgetDocuments(s, root + "/corpus", root + "/idx", ids)
      val copies = forgotten
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      // Persist the survivor set (the dedupSink discipline): the
      // fromDataFrame stats pass and the append would otherwise each
      // re-run the whole dedupBatch join pipeline.
      val survivors = Dedup.dedupBatch(s, copies, "doc_id", "text",
        PDataset.scanParquet(s, root + "/corpus").toDF, root + "/idx")
        .persist()
      try PDataset.fromDataFrame(survivors, Seq("doc_id"))
        .writeParquet(root + "/corpus", append = true)
      finally { survivors.unpersist(); () }
      PDataset.scanParquet(s, root + "/corpus").toDF
        .select("doc_id", "text").orderBy("doc_id")
    }),

    // -- text analysis --
    "q_text_stats" -> ((s, d) =>
      scan(s, d, "documents").toDF.select(
        col("doc_id"),
        length(col("text")).as("n_chars_actual"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.subwordCount(col("text")).as("n_subwords"),
        round(TextFunctions.punctRatio(col("text")), 4).as("punct_ratio"),
        TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    "q_quality_filter" -> ((s, d) =>
      scan(s, d, "documents").toDF.select(
        col("doc_id"),
        graft.functions.TextFunctions.qualityFilterReason(col("text"))
          .as("reason"))
        .withColumn("keep", col("reason") === "ok")
        .orderBy("doc_id")),

    // URL canonicalization for corpus curation: host extraction +
    // canonical form (lowercase scheme/host, default ports and
    // fragments and tracking params dropped, userinfo stripped) as
    // pure regex algebra — the grouping key for per-domain quota
    // caps. Fixture URLs derive from doc_id so the oracle rebuilds
    // the identical inputs.
    "q_url_canon" -> ((s, d) => {
      val id = col("doc_id")
      val url = when(id % 6 === 0, concat(
          lit("HTTP://User:Pw@WWW.Example"), id % 5, lit(".COM:80/Path/"),
          id, lit("?utm_source=feed&id="), id, lit("&fbclid=zz#frag")))
        .when(id % 6 === 1, concat(lit("https://Site"), id % 5,
          lit(".org:443/x?id="), id, lit("&utm_campaign=x")))
        .when(id % 6 === 2, concat(lit("https://site"), id % 5,
          lit(".org:8443/keep?gclid=1")))
        .when(id % 6 === 3, concat(lit("ftp://Mixed.Case.Net/data/"), id))
        .when(id % 6 === 4, concat(lit("not a url "), id))
        .otherwise(concat(lit("http://bare"), id % 5, lit(".com")))
      scan(s, d, "documents").toDF
        .select(id, url.as("url"))
        .select(id, col("url"),
          graft.functions.UrlFunctions.urlHost(col("url")).as("host"),
          graft.functions.UrlFunctions.urlCanon(col("url")).as("canon"))
        .orderBy("doc_id")
    }),

    // DSIR data selection (arXiv:2302.03169): the 100 raw documents
    // most like the English target slice, by hashed-trigram
    // importance weights with deterministic (id-derived) Gumbel
    // top-k — two bounded models, one gram pass over the raw corpus,
    // a TakeOrdered top-k. The draw is a pure function of
    // (corpus, ids), so DuckDB rederives the exact selected set.
    "q_dsir_select" -> ((s, d) => {
      // The two trigram models are deterministic read-only artifacts
      // (count-desc/hash-asc truncation): train once per process and
      // persist (the production shape — DSIR reuses its models across
      // every selection run), so the timed body is the operator under
      // test — one gram scan + two model joins + Gumbel top-k — not
      // two re-trainings of the same models.
      val docs = scan(s, d, "documents").toDF
      val models = fixture("dsirmodels", d) { out =>
        graft.operators.LanguageModel
          .trainTrigramModel(docs.filter(col("lang") === "en"), "text",
            4096)
          .write.parquet(out + "/target")
        graft.operators.LanguageModel
          .trainTrigramModel(docs, "text", 4096)
          .write.parquet(out + "/raw")
      }
      graft.operators.ImportanceSampling.dsirSelectWithModels(
        docs, s.read.parquet(models + "/target"),
        s.read.parquet(models + "/raw"), "doc_id", "text", k = 100)
        .orderBy("doc_id")
    }),

    // CCNet-style LM quality signal: a char-trigram unigram model
    // trained on the corpus itself (top-4096 gram hashes, count-desc/
    // hash-asc truncation — deterministic), every document scored by
    // mean -log2 smoothed trigram probability. One aggregate to
    // train, one explode+join+mean to score; the model is bounded
    // (KenLM-binary style), so the scoring join broadcasts under AQE.
    "q_lm_score" -> ((s, d) =>
      graft.operators.LanguageModel.lmScoreSelf(
        scan(s, d, "documents").toDF, "doc_id", "text", vocab = 4096)
        .orderBy("doc_id")),

    // Gopher-style repetition gates: duplicate-line char fraction,
    // top-trigram share, repeated-trigram ratio — one kernel pass,
    // aliased once so the three extractions don't re-run it.
    "q_quality_repetition" -> ((s, d) =>
      scan(s, d, "documents").toDF
        .withColumn("__r",
          TextFunctions.repetitionStats(col("text"), 3))
        .select(
          col("doc_id"),
          col("__r").getItem(0).as("dup_line_frac"),
          col("__r").getItem(1).as("top_ngram_frac"),
          col("__r").getItem(2).as("dup_ngram_frac"))
        .orderBy("doc_id")),

    "q_sample_stratified" -> ((s, d) =>
      graft.operators.Sampling.stratifiedSample(
        scan(s, d, "documents").toDF, "lang", "doc_id",
        Map("en" -> 0.5, "zh" -> 0.25), defaultFraction = 0.1)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // Temperature-flattened language mixture (alpha = 0.5): one
    // broadcast count aggregate + the narrow hash-fraction filter;
    // sqrt keeps the per-language fraction bit-identical across
    // engines. (Flattens on lang — the synthetic corpus' skewed
    // column; source is uniform so it would be a no-op.)
    "q_mixture_temperature" -> ((s, d) =>
      graft.operators.Sampling.mixtureByTemperature(
        scan(s, d, "documents").toDF, "lang", "doc_id", alpha = 0.5)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")),

    // Per-source TOKEN-budget sampling (the way training mixtures
    // are actually specified): every source contributes ~7500 chars,
    // filled in deterministic md5 order. Under-budget sources pass
    // through with NO shuffle; over-budget sources window only a
    // hash-prefiltered candidate set bounded by the BUDGET (not the
    // corpus) — the shape that survives a 50 TB source with a 10 GB
    // quota.
    "q_token_budget" -> ((s, d) =>
      graft.operators.Sampling.sampleByTokenBudget(
        scan(s, d, "documents").toDF, "source", "doc_id", "n_chars",
        budget = 7500L)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),

    // Byte-level BPE token counts under a PERSISTED model dir
    // (merges.txt + vocab.json — the public interchange format every
    // GPT-2-family tokenizer ships). The fixture model holds ONE
    // merge ("a","b"), under which the published pipeline (byte map →
    // GPT-2 pre-tokenizer → merge loop) reduces to a closed form the
    // oracle rederives exactly: the pre-tokenizer never splits
    // adjacent letters and only raw bytes 0x61 0x62 map to the
    // mergeable pair, so count = utf8_bytes − occurrences("ab").
    // Spark runs the REAL loaded-model expression; the multi-merge
    // cascade is pinned against a driver-side reference and the
    // published GPT-2 examples in PipelineOpsSpec.
    "q_bpe_count" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-bpe")
        .resolve("model").toString
      graft.functions.Bpe.writeModel(s, dir, Seq(("a", "b")),
        Map("a" -> 0, "b" -> 1, "ab" -> 2))
      val model = graft.functions.Bpe.loadModel(s, dir)
      scan(s, d, "documents").toDF.select(col("doc_id"),
        graft.functions.Bpe.bpeCount(coalesce(col("text"), lit("")), model)
          .cast("long").as("n_bpe"))
        .orderBy("doc_id")
    }),

    // WebDataset-style export: the corpus written as 8 USTAR tar
    // shards in a deterministic shuffled member order (one shuffle,
    // each task streams its shards member-by-member), then read back
    // through the whole-file tar walk — the layout sequential
    // training loaders consume. The roundtrip equality IS the check.
    "q_webdataset" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-wds")
        .resolve("out").toString
      val docs = s.read.parquet(T(d, "documents")).select("doc_id", "text")
      graft.operators.Export.writeTarShards(
        docs, "doc_id", "text", dir, numShards = 8, seed = "epoch1")
      graft.operators.Export.readTarShards(s, dir)
        .select(regexp_replace(col("name"), "\\.txt$", "")
          .cast("long").as("doc_id"), col("text"))
        .orderBy("doc_id")
    }),

    // Multi-column WebDataset samples: one member per exported column
    // per document (<id>.txt + <id>.lng back-to-back — the pairing
    // standard loaders consume), reassembled by STEM on the way back.
    // The lossless two-column roundtrip IS the check.
    "q_webdataset_multi" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-wdsm")
        .resolve("out").toString
      val docs = s.read.parquet(T(d, "documents"))
        .select("doc_id", "text", "lang")
      graft.operators.Export.writeTarShards(
        docs, "doc_id", Seq("text" -> "txt", "lang" -> "lng"),
        dir, numShards = 8, seed = "epoch1")
      graft.operators.Export.readTarSamples(s, dir, Seq("txt", "lng"))
        .select(col("stem").cast("long").as("doc_id"),
          col("txt").cast("string").as("text"),
          col("lng").cast("string").as("lang"))
        .orderBy("doc_id")
    }),

    // Deterministic shard assignment: reproducible corpus shuffle
    // into 8 training shards (shard + in-shard position are a pure
    // function of the seed and the doc id).
    "q_shard_assign" -> ((s, d) =>
      graft.operators.Sampling.shardAssign(
        scan(s, d, "documents").toDF, "doc_id", numShards = 8,
        seed = "epoch1")
        .select("doc_id", "shard", "shard_pos")
        .orderBy("doc_id")),

    // Deterministic train/valid/test split: seeded md5 fraction vs
    // cumulative weights (dyadic here, so the cuts are bit-exact
    // across engines); membership is a pure function of (seed, id).
    "q_split_assign" -> ((s, d) =>
      graft.operators.Sampling.splitAssign(
        scan(s, d, "documents").toDF, "doc_id",
        Seq("train" -> 0.75, "valid" -> 0.125, "test" -> 0.125),
        seed = "split1")
        .select("doc_id", "split")
        .orderBy("doc_id")),

    "q_lang_id" -> ((s, d) =>
      scan(s, d, "documents").toDF.select(
        col("doc_id"),
        TextFunctions.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    // Concatenate-and-chunk sequence packing: every document's global
    // token offset (distributed two-pass prefix sum — no global sort,
    // no single-partition window) and the 512-token training
    // sequences it spans. buckets=16 forces the multi-bucket
    // quantile path at every SF; offsets are bucketing-independent.
    "q_pack_sequences" -> ((s, d) => {
      val docs = scan(s, d, "documents").toDF.select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.operators.Packing.packSequences(
        docs, "doc_id", "n_tokens", seqLen = 512, buckets = 16)
        .select("doc_id", "n_tokens", "tok_offset",
          "seq_first", "seq_last", "n_seqs")
        .orderBy("doc_id")
    }),

    // PII scrub before publishing a corpus: deterministic synthetic
    // PII is appended per doc (both engines compute the same dirty
    // input), then redacted + counted in one narrow scan.
    "q_pii_redact" -> ((s, d) => {
      val dirty = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com ip 10."), (col("doc_id") % 256).cast("string"),
        lit(".0.1 tel 555-867-5309"))
      scan(s, d, "documents").toDF.select(
        col("doc_id"),
        md5(TextFunctions.redactPii(dirty)).as("red_md5"),
        TextFunctions.piiCount(dirty).as("n_pii"))
        .orderBy("doc_id")
    }),

    // Decontamination with a broadcast Bloom prefilter + exact
    // verify join — the benchmark-too-big-to-broadcast shape; result
    // is bit-identical to q_decontaminate (shared oracle).
    "q_decontaminate_bloom" -> ((s, d) => {
      val docs = scan(s, d, "documents").toDF
      Dedup.decontaminateBloom(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", shingleWords = 4)
        .orderBy("doc_id")
    }),

    "q_fingerprint" -> ((s, d) =>
      scan(s, d, "documents").toDF.select(
        col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // Unicode-canonical fingerprints (the dedup pre-pass) through the
    // single-pass canon_text codegen kernel: NFC + lowercase + accent
    // strip + non-alphanumeric folding in ONE string walk per row —
    // Spark has no built-in Unicode normalization, and the regex
    // composition walks the string four times. On the (ASCII) fixture
    // the oracle's regexp form is byte-identical; the Unicode steps
    // are pinned in PipelineOpsSpec.
    "q_canon_fp" -> ((s, d) =>
      scan(s, d, "documents").toDF.select(
        col("doc_id"),
        md5(TextFunctions.canonText(col("text"))).as("canon_fp"))
        .orderBy("doc_id")),

    "q_fingerprint_winnow" -> ((s, d) =>
      scan(s, d, "documents").toDF.select(
        col("doc_id"),
        explode(TextFunctions.winnowFingerprints(col("text"))).as("fp"))
        .orderBy("doc_id", "fp")),

    "q_percentiles" -> ((s, d) =>
      scan(s, d, "lineitem").toDF
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_quantity, 0.95)"), 4).as("p95_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
        .orderBy("l_returnflag")),

    // -- similarity search --
    "q_embed_norm" -> ((s, d) =>
      scan(s, d, "embeddings").toDF.select(
        col("vec_id"),
        round(Similarity.l2norm(col("embedding")), 3).as("norm"))
        .orderBy("vec_id")),

    // Chunk-to-document embedding pooling: the mean of each dimension
    // over the group's vectors (vec_id % 50 plays the document id);
    // the shuffle carries one per-dimension partial (sum, count) per
    // group, never whole vectors. Output exploded to (group, dim,
    // val) so the cross-engine compare stays scalar. Final rounding is
    // the portable floor(x*1e4 + 0.5)/1e4 (pure IEEE arithmetic,
    // identical in any engine) rather than round(v, 4): for means in
    // (-5e-5, 0) DuckDB's round returns -0.0 while Spark's
    // BigDecimal-based Round returns +0.0 — equal as doubles but not
    // as formatted text, which is exactly what a hash compare sees.
    // The floor form can never yield -0.0 (adding +0.5 before floor
    // kills the sign of an underflowed negative).
    "q_embed_pool" -> ((s, d) =>
      graft.operators.Similarity.meanPool(
        scan(s, d, "embeddings").toDF
          .withColumn("group_id", col("vec_id") % 50),
        "group_id", "embedding")
        .select(col("group_id"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("group_id"), col("dim"),
          (floor(col("v") * 10000 + lit(0.5)) / 10000).as("val"))
        .orderBy("group_id", "dim")),

    "q_ann_brute" -> ((s, d) => {
      val emb = scan(s, d, "embeddings").toDF
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    // Recall contracts: approximate indexes (LSH, IVF) cannot be
    // reproduced by a SQL engine by design — instead Spark grades its
    // own recall@5 against the exact brute-force baseline and emits
    // the (seeded, deterministic) result as one row; the oracle is
    // that constant.
    "q_ann_lsh" -> ((s, d) => {
      val emb = scan(s, d, "embeddings").toDF
      val q = emb.filter(col("vec_id") < 10)
      // few planes + many tables: this corpus is near-orthogonal, so
      // fine buckets would have ~zero recall (see PipelineOpsSpec)
      // Measured recall@5: 0.78 at sf0.01, 0.60 at sf0.1 — floor 0.5.
      recallContract(
        Similarity.lshTopK(q, emb, "vec_id", "embedding",
          k = 5, dim = 64, nPlanes = 4, tables = 8),
        Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5),
        floor = 0.5)
    }),

    "q_ann_ivf" -> ((s, d) => {
      val emb = scan(s, d, "embeddings").toDF
      val q = emb.filter(col("vec_id") < 10)
      // Measured recall@5: 0.48 at both sf0.01 and sf0.1 — floor 0.4.
      recallContract(
        Similarity.ivfTopK(q, emb, "vec_id", "embedding",
          k = 5, dim = 64, nlist = 16, nprobe = 4),
        Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5),
        floor = 0.4)
    }),

    // Persisted index: train ONCE into a graft-sidecar directory
    // (cells range-clustered, centroids in a JSON sidecar), then
    // query WITHOUT retraining — the production many-batches shape.
    // Same seeded training as q_ann_ivf, so the same recall floor.
    "q_ann_ivf_indexed" -> ((s, d) => {
      val emb = scan(s, d, "embeddings").toDF
      val q = emb.filter(col("vec_id") < 10)
      val dir = fixture("ivfidx", d) { out =>
        graft.operators.VectorIndex.build(s, emb, "vec_id", "embedding",
          out, dim = 64, nlist = 16)
      }
      recallContract(
        graft.operators.VectorIndex.topK(s, q, dir, "vec_id", "embedding",
          k = 5, nprobe = 4),
        Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5),
        floor = 0.4)
    }),

    // Growing-corpus path of the persisted index: build on 80% of the
    // corpus, absorb the rest via addVectors (frozen geometry, zero
    // retraining, incremental append), query against the WHOLE corpus
    // brute-force truth — added vectors must be as findable as built
    // ones. The index dir mutates, so each run appends to a fresh
    // copy of the build-once fixture.
    "q_ann_index_add" -> ((s, d) => {
      val emb = scan(s, d, "embeddings").toDF
      val dir = mutableCopy("ivfaddbase", d) { out =>
        graft.operators.VectorIndex.build(s,
          emb.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding",
          out, dim = 64, nlist = 16)
      }
      graft.operators.VectorIndex.addVectors(s,
        emb.filter(col("vec_id") % 5 === 0), "vec_id", "embedding", dir)
      val q = emb.filter(col("vec_id") < 10)
      recallContract(
        graft.operators.VectorIndex.topK(s, q, dir, "vec_id", "embedding",
          k = 5, nprobe = 4),
        Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5),
        floor = 0.4)
    }),

    "q_ann_ivfpq" -> ((s, d) => {
      val emb = scan(s, d, "embeddings").toDF
      val q = emb.filter(col("vec_id") < 10)
      // Composed IVF-PQ: probed cells only (equi-join on cell id) AND
      // compressed code scan. Measured recall@5: 0.30 at sf0.01, 0.20
      // at sf0.1 (cell pruning stacks on PQ's quantization loss on
      // near-orthogonal random vectors) — floor 0.15.
      recallContract(
        Similarity.ivfPqTopK(q, emb, "vec_id", "embedding",
          k = 5, dim = 64, nlist = 16, nprobe = 4, m = 16, ksub = 32),
        Similarity.bruteForceL2TopK(q, emb, "vec_id", "embedding", k = 5),
        floor = 0.15)
    }),

    // -- multimodal plumbing (decode stubbed; see Multimodal) --
    "q_multimodal" -> ((s, d) => {
      val docs = scan(s, d, "documents").toDF
      val withPayload = Multimodal.attachPayload(docs, "doc_id", "text")
      Multimodal.decodeStub(withPayload, "doc_id")
        .withColumn("mean_byte", round(col("mean_byte"), 4))
        .orderBy("doc_id")
    }),

    "q_multimodal_frames" -> ((s, d) => {
      val docs = scan(s, d, "documents").toDF
      Multimodal.frameSample(
        Multimodal.attachPayload(docs, "doc_id", "text"),
        "doc_id", frameBytes = 32, stride = 4)
        .select("doc_id", "frame_idx", "frame_bytes", "head_hex")
        .orderBy("doc_id", "frame_idx")
    })
  )

  /** DuckDB-runnable oracles — one per query. Engine-specific pieces
    * are handled head-on: simhash's token hash is md5-derived so the
    * whole fingerprint rederives in SQL, and LSH ANN (approximate by
    * construction) is graded by a Spark-side recall contract whose
    * seeded constant is the oracle. */
  def oracleSql: Map[String, String] = {
    val normT =
      "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    // Word-trigram shingles: list_slice(w, i, i+2) clamps at the end
    // exactly like Spark's slice(toks, i, 3), so short docs agree too.
    def shingleCte(filter: String) = s"""
      WITH docs AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents $filter),
      sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 range(1, greatest(len(w)-2, 1)+1),
                 i -> array_to_string(
                        list_slice(w, CAST(i AS INT), CAST(i AS INT)+2),
                        ' ')))) AS s
        FROM docs),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS "idA", b.doc_id AS "idB", count(*) AS i
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      jac AS (
        SELECT "idA", "idB",
               round(i*1.0/(s1.n + s2.n - i), 4) AS jaccard
        FROM inter
        JOIN sizes s1 ON "idA" = s1.doc_id
        JOIN sizes s2 ON "idB" = s2.doc_id)
      SELECT "idA", "idB", jaccard FROM jac
      WHERE jaccard >= 0.85 ORDER BY "idA", "idB""""

    val decontaminateOracle = """
        WITH corp AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
          FROM documents WHERE doc_id % 97 <> 0),
        bench AS (
          SELECT string_split_regex(trim(lower(text)), '\s+') AS w
          FROM documents WHERE doc_id % 97 = 0),
        bsh AS (
          SELECT DISTINCT unnest(list_distinct(list_transform(
                 range(1, greatest(len(w)-3, 1)+1),
                 i -> array_to_string(
                        list_slice(w, CAST(i AS INT), CAST(i AS INT)+3),
                        ' ')))) AS s
          FROM bench),
        csh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   range(1, greatest(len(w)-3, 1)+1),
                   i -> array_to_string(
                          list_slice(w, CAST(i AS INT), CAST(i AS INT)+3),
                          ' ')))) AS s
          FROM corp)
        SELECT c.doc_id, count(*) AS hits
        FROM csh c JOIN bsh b ON c.s = b.s
        GROUP BY c.doc_id ORDER BY c.doc_id"""

    // ExactSubstr rederived end to end (shared by q_dedup_spans and
    // q_span_audit): plant the passage, tokenize with exact char
    // offsets via the interleaved-split trick (separator lengths +
    // running window sums), build 8-token shingles keyed by the token
    // STRING (the Spark side keys by a 62-bit hash of the same
    // string; the oracle grouping on the raw string doubles as a
    // collision check), drop the min-(doc_id, start) keeper per
    // shingle, then gaps-and-islands merge per document. Plain (non-
    // interpolated) literal so \t\n\r survive into the regex.
    // shared tokenization/shingling stages (offset-exact interleaved
    // split + 8-token windowed shingles) — everything between the
    // fixture CTE `d` and the duplicated-occurrence stage `sphits`
    val spanTokCte = """
        spbase AS (
          SELECT doc_id, t,
                 regexp_extract_all(t, '[^ \t\n\r]+') AS toks,
                 string_split_regex(t, '[^ \t\n\r]+') AS seps
          FROM d),
        sptok AS (
          SELECT doc_id,
                 unnest(range(1, len(toks) + 1)) AS i,
                 unnest(toks) AS tok,
                 unnest(list_transform(range(1, len(toks) + 1),
                                       j -> len(seps[CAST(j AS INT)]))) AS sep_len
          FROM spbase),
        sppos AS (
          SELECT doc_id, i, tok,
                 sum(sep_len + len(tok)) OVER w - len(tok) AS s0,
                 sum(sep_len + len(tok)) OVER w AS e0
          FROM sptok
          WINDOW w AS (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING)),
        spsh AS (
          SELECT * FROM (
            SELECT doc_id, s0 AS s,
                   lead(e0, 7) OVER (PARTITION BY doc_id ORDER BY i) AS e,
                   string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY i
                     ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS shs
            FROM sppos)
          WHERE e IS NOT NULL)"""

    // cross-doc duplication: a shingle in >= 2 distinct docs; keeper =
    // the min-(doc_id, s) occurrence corpus-wide
    val spanCrossDup = """
        spdup AS (
          SELECT shs FROM spsh GROUP BY shs
          HAVING count(DISTINCT doc_id) >= 2),
        spocc AS (
          SELECT spsh.doc_id, spsh.s, spsh.e,
                 row_number() OVER (PARTITION BY spsh.shs
                   ORDER BY spsh.doc_id, spsh.s) AS rn
          FROM spsh JOIN spdup USING (shs)),
        sphits AS (
          SELECT doc_id, s, e FROM spocc WHERE rn > 1)"""

    // within-doc duplication: a shingle occurring >= 2 times in the
    // SAME doc; keeper = its first occurrence there
    val spanSelfDup = """
        spocc AS (
          SELECT doc_id, s, e,
                 count(*) OVER (PARTITION BY doc_id, shs) AS n,
                 row_number() OVER (PARTITION BY doc_id, shs
                   ORDER BY s) AS rn
          FROM spsh),
        sphits AS (
          SELECT doc_id, s, e FROM spocc WHERE n >= 2 AND rn > 1)"""

    // gaps-and-islands merge into maximal disjoint spans per doc —
    // prefix-parameterized so the composed oracle can merge twice
    // (the self stage's spans, then the union)
    def spanMergeCtes(pfx: String, src: String): String = s"""
        ${pfx}flag AS (
          SELECT doc_id, s, e,
                 CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id
                     ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                      THEN 1 ELSE 0 END AS f
          FROM $src),
        ${pfx}grp AS (
          SELECT doc_id, s, e,
                 sum(f) OVER (PARTITION BY doc_id ORDER BY s, e
                   ROWS UNBOUNDED PRECEDING) AS g
          FROM ${pfx}flag),
        ${pfx}merged AS (
          SELECT doc_id, min(s) AS s, max(e) AS e
          FROM ${pfx}grp GROUP BY doc_id, g)"""
    val spanMergeTail = spanMergeCtes("sp", "sphits")

    // cutting: string_agg of kept segments + the tail past the last
    // span; docs without spans pass through the left join untouched
    val spanCutTail = """,
        spseg AS (
          SELECT m.doc_id, m.s, m.e,
                 coalesce(lag(m.e) OVER (PARTITION BY m.doc_id
                   ORDER BY m.s), 0) AS pe
          FROM spmerged m),
        spcut AS (
          SELECT spseg.doc_id,
                 string_agg(substr(d.t, CAST(pe + 1 AS INT),
                     CAST(s - pe AS INT)), '' ORDER BY s)
                   || substr(d.t, CAST(max(e) + 1 AS INT)) AS text
          FROM spseg JOIN d USING (doc_id)
          GROUP BY spseg.doc_id, d.t)
        SELECT d.doc_id, coalesce(c.text, d.t) AS text
        FROM d LEFT JOIN spcut c USING (doc_id)
        ORDER BY doc_id"""

    // the cross-doc fixture: a 12-token passage planted on doc_id%7==0
    val spanCrossFixture = """
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0
                      THEN text || ' alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima'
                      ELSE text END AS t
          FROM documents),"""

    // the within-doc fixture: the SAME passage planted TWICE (with an
    // interlude) on doc_id%11==0 — self-repetition to trim
    val spanSelfFixture = """
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 11 = 0
                      THEN text || ' alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima interlude alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima'
                      ELSE text END AS t
          FROM documents),"""

    val spanMergedCte = spanCrossFixture + spanTokCte + "," +
      spanCrossDup + "," + spanMergeTail
    val spanSelfMergedCte = spanSelfFixture + spanTokCte + "," +
      spanSelfDup + "," + spanMergeTail

    // the incremental variant (q_dedup_spans_inc) is graded against
    // the ONE-SHOT recipe restricted to the batch half: evens are the
    // indexed corpus, odds the batch, and incremental-vs-index must
    // cut the odds exactly as a one-shot over the union would
    val spanCutTailBatch = spanCutTail.replace(
      "ORDER BY doc_id",
      "WHERE d.doc_id % 2 = 1 ORDER BY doc_id")

    // the composed fixture: %11 docs self-repeat the passage, other
    // %7 docs carry one cross-doc copy
    val spanBothFixture = """
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 11 = 0
                      THEN text || ' alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima interlude alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima'
                      WHEN doc_id % 7 = 0
                      THEN text || ' alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima'
                      ELSE text END AS t
          FROM documents),"""

    // the composed recipe from ONE tokenization (mirrors
    // duplicatedSpans alsoWithinDoc): self hits, their merged spans,
    // cross-doc duplication over the SURVIVING shingles, then one
    // merge of the union
    val spanBothMergedCte = spanBothFixture + spanTokCte + "," + """
        sbocc AS (
          SELECT doc_id, s, e,
                 count(*) OVER (PARTITION BY doc_id, shs) AS n,
                 row_number() OVER (PARTITION BY doc_id, shs
                   ORDER BY s) AS rn
          FROM spsh),
        sbhits AS (
          SELECT doc_id, s, e FROM sbocc WHERE n >= 2 AND rn > 1),""" +
      spanMergeCtes("sb", "sbhits") + "," + """
        surv AS (
          SELECT spsh.* FROM spsh
          WHERE NOT EXISTS (
            SELECT 1 FROM sbmerged m
            WHERE m.doc_id = spsh.doc_id
              AND spsh.s < m.e AND spsh.e > m.s)),
        xdup AS (
          SELECT shs FROM surv GROUP BY shs
          HAVING count(DISTINCT doc_id) >= 2),
        xocc AS (
          SELECT surv.doc_id, surv.s, surv.e,
                 row_number() OVER (PARTITION BY surv.shs
                   ORDER BY surv.doc_id, surv.s) AS rn
          FROM surv JOIN xdup USING (shs)),
        sphits AS (
          SELECT doc_id, s, e FROM sbhits
          UNION ALL
          SELECT doc_id, s, e FROM xocc WHERE rn > 1),""" +
      spanMergeTail

    // Connected-component labels (recursive reachability closure,
    // min-id canonical) over the 0.85-jaccard trigram pair graph —
    // shared by q_dedup_clusters and q_dedup_corpus. Plain (non-
    // interpolated) literal so \s+ survives.
    val clusterLabCte = """
        WITH RECURSIVE docs AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
          FROM documents),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   range(1, greatest(len(w)-2, 1)+1),
                   i -> array_to_string(
                          list_slice(w, CAST(i AS INT), CAST(i AS INT)+2),
                          ' ')))) AS s
          FROM docs),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT ida, idb
          FROM inter
          JOIN sizes s1 ON ida = s1.doc_id
          JOIN sizes s2 ON idb = s2.doc_id
          WHERE round(i*1.0/(s1.n + s2.n - i), 4) >= 0.85),
        edges AS (
          SELECT ida AS a, idb AS b FROM pairs
          UNION
          SELECT idb AS a, ida AS b FROM pairs),
        reach AS (
          SELECT a AS src, a AS node FROM (SELECT DISTINCT a FROM edges)
          UNION
          SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a),
        lab AS (
          SELECT src AS doc_id, min(node) AS cluster_id
          FROM reach GROUP BY src)"""

    Map(
      "q_scan_collect" -> s"SELECT * FROM lineitem $lineitemOrderSql",
      "q_reindex_stats" ->
        "SELECT count(*) AS n_rows, min(l_shipdate) AS lb, max(l_shipdate) AS ub FROM lineitem",
      "q_slice" ->
        s"""SELECT * FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01' $lineitemOrderSql""",
      "q_slice_inclusive" ->
        s"""SELECT * FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-06-01'
              AND l_shipdate <= TIMESTAMP '1997-06-01' $lineitemOrderSql""",
      "q_repartition_roundtrip" -> s"SELECT * FROM lineitem $lineitemOrderSql",
      "q_rowmode_repartition" -> s"SELECT * FROM lineitem $lineitemOrderSql",
      "q_collate" -> s"SELECT * FROM lineitem $lineitemOrderSql",
      "q_concat" ->
        """SELECT * FROM (SELECT * FROM region UNION ALL SELECT * FROM region)
           ORDER BY r_regionkey, r_name""",
      "q_rename" ->
        """SELECT n_nationkey AS nationkey, n_name AS name,
                  n_regionkey AS regionkey
           FROM nation ORDER BY nationkey""",
      "q_map_partition" ->
        """SELECT l_orderkey, l_linenumber,
                  l_extendedprice * (1 - l_discount) AS revenue
           FROM lineitem WHERE l_quantity >= 25
           ORDER BY l_orderkey, l_linenumber, revenue""",
      "q_from_dataframe" ->
        "SELECT count(*) AS n_rows, min(o_orderdate) AS lb, max(o_orderdate) AS ub FROM orders",
      "q_write_roundtrip" -> "SELECT * FROM orders ORDER BY o_orderkey",
      "q_compact" -> "SELECT * FROM orders ORDER BY o_orderkey",
      "q_recluster" -> "SELECT * FROM orders ORDER BY o_orderkey",
      "q_scan_orc" ->
        """SELECT * FROM orders
           WHERE o_orderkey >= 1000 AND o_orderkey < 5000
           ORDER BY o_orderkey""",
      "q_bloom_lookup" ->
        "SELECT * FROM orders WHERE o_custkey = 42 ORDER BY o_orderkey",
      "q_time_travel" -> "SELECT * FROM orders ORDER BY o_orderkey",
      "q_rename_column" ->
        """SELECT o_orderkey AS order_id, o_custkey, o_orderstatus,
                  CASE WHEN o_orderkey >= 1000 AND o_orderkey < 1400
                       THEN o_totalprice * 2 ELSE o_totalprice
                  END AS price,
                  o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey < 2000 ORDER BY order_id""",
      "q_widen_column" ->
        """SELECT o_orderkey, o_custkey,
                  CASE WHEN o_orderkey >= 1000 AND o_orderkey < 1400
                       THEN o_orderkey + 4000000000
                       ELSE o_orderkey % 1000
                  END AS cnt,
                  o_totalprice
           FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""",
      "q_schema_evolution" ->
        """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority,
                  CASE WHEN o_orderkey >= 1000 AND o_orderkey < 1400
                       THEN 'FLAGGED' END AS o_flag
           FROM orders ORDER BY o_orderkey""",
      "q_delete_range" ->
        """SELECT * FROM orders
           WHERE NOT (o_orderkey >= 1000 AND o_orderkey < 5000)
           ORDER BY o_orderkey""",
      "q_metadata_count" -> "SELECT count(*) AS n FROM orders",
      "q_view_rewrite" ->
        """SELECT o_custkey, count(*) AS n,
                  sum(CAST(o_orderkey % 50 AS DOUBLE)) AS o_qty_sum
           FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
      "q_incremental_view" ->
        """WITH src AS (
             SELECT o_orderkey, o_custkey,
                    CASE WHEN o_orderkey >= 1000 AND o_orderkey < 1400
                         THEN CAST(o_orderkey % 7 AS DOUBLE)
                         ELSE CAST(o_orderkey % 50 AS DOUBLE) END AS o_qty
             FROM orders
             WHERE o_orderkey < 100 OR o_orderkey >= 300
             UNION ALL
             SELECT o_orderkey + 1000000000, o_custkey, 3.0
             FROM orders WHERE o_orderkey % 997 = 0)
           SELECT o_custkey, count(*) AS n, sum(o_qty) AS o_qty_sum,
                  count(o_qty) AS o_qty_nn
           FROM src GROUP BY o_custkey ORDER BY o_custkey""",
      "q_distinct_view" ->
        """WITH src AS (
             SELECT o_custkey FROM orders
             UNION ALL
             SELECT o_custkey FROM orders WHERE o_orderkey % 997 = 0)
           SELECT o_custkey, count(*) AS n, TRUE AS nd_ok
           FROM src GROUP BY o_custkey ORDER BY o_custkey""",
      "q_restore" -> "SELECT * FROM orders ORDER BY o_orderkey",
      "q_history" ->
        """WITH b AS (SELECT count(*) AS c FROM orders),
                i AS (SELECT count(*) AS c FROM orders
                      WHERE o_orderkey % 997 = 0),
                d AS (SELECT count(*) AS c FROM orders
                      WHERE o_orderkey % 401 = 0 AND o_orderkey <> 0)
           SELECT 0 AS version, FALSE AS is_current,
                  (SELECT c FROM b) AS n_rows
           UNION ALL
           SELECT 1, FALSE, (SELECT c FROM b) + (SELECT c FROM i)
           UNION ALL
           SELECT 2, TRUE,
                  (SELECT c FROM b) + (SELECT c FROM i) - (SELECT c FROM d)
           ORDER BY version""",
      "q_colstats" ->
        """SELECT o_orderkey, o_custkey, o_totalprice
           FROM orders
           WHERE o_orderkey * 3 >= 6000 AND o_orderkey * 3 < 9000
           ORDER BY o_orderkey""",
      "q_metadata_minmax" ->
        """SELECT min(o_orderkey * 3) AS v_min,
                  max(o_orderkey * 3) AS v_max,
                  CAST(sum(o_orderkey * 3) AS BIGINT) AS v_sum,
                  count(o_totalprice) AS price_n,
                  count(*) AS n
           FROM orders""",
      "q_metadata_groupby" ->
        """SELECT o_orderkey % 4 AS bucket, count(*) AS n,
                  min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
                  CAST(sum(o_custkey) AS BIGINT) AS sum_ck
           FROM orders GROUP BY 1 ORDER BY bucket""",
      "q_metadata_filtered" ->
        """SELECT count(*) AS n, min(o_custkey) AS min_ck,
                  max(o_custkey) AS max_ck,
                  CAST(sum(o_custkey) AS BIGINT) AS sum_ck
           FROM orders WHERE o_orderkey % 4 >= 2""",
      "q_constraint" ->
        """WITH delta AS (
             SELECT * FROM lineitem WHERE l_orderkey % 11 = 0)
           SELECT name, n_bad FROM (
             SELECT 'c_discount' AS name,
                    count(CASE WHEN NOT coalesce(l_discount <= 0.05, TRUE)
                               THEN 1 END) AS n_bad
             FROM delta
             UNION ALL
             SELECT 'c_flag_qty',
                    count(CASE WHEN NOT coalesce(
                        CASE WHEN l_returnflag = 'A'
                             THEN l_quantity <= 49 END, TRUE)
                               THEN 1 END)
             FROM delta
             UNION ALL
             SELECT 'c_quantity',
                    count(CASE WHEN NOT coalesce(l_quantity < 45, TRUE)
                               THEN 1 END)
             FROM delta)
           ORDER BY name""",
      "q_delete_keys" ->
        """SELECT * FROM orders WHERE o_orderkey % 401 <> 0
           ORDER BY o_orderkey""",
      "q_delete_dv" ->
        """SELECT * FROM orders
           WHERE (o_orderkey % 401 <> 0 OR o_orderkey = 0)
             AND NOT (o_orderpriority = '1-URGENT'
                      AND o_orderkey % 13 = 0)
           ORDER BY o_orderkey""",
      "q_merge" ->
        """SELECT o_orderkey, o_custkey, o_orderstatus,
                  CASE WHEN o_orderkey % 701 = 0 THEN o_totalprice * 2
                       ELSE o_totalprice END AS o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders
           WHERE o_orderkey % 997 <> 0 OR o_orderkey = 0
           ORDER BY o_orderkey""",
      "q_upsert" ->
        """WITH upd AS (
             SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                    o_totalprice * 2 AS o_totalprice, o_orderdate,
                    o_orderpriority
             FROM orders WHERE o_orderkey % 701 = 0
             UNION ALL
             SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus,
                    o_totalprice, o_orderdate, 'NEW' AS o_orderpriority
             FROM orders WHERE o_orderkey % 997 = 0)
           SELECT * FROM orders
           WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
           UNION ALL SELECT * FROM upd
           ORDER BY o_orderkey""",
      // CDF classification: an updated key (one row lost, one row
      // gained) emits its update_preimage/update_postimage pair; a
      // brand-new key emits insert — the same per-key arithmetic the
      // engine's one-window pass over the delta derives.
      "q_changes" ->
        """WITH upd AS (
             SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                    o_totalprice * 2 AS o_totalprice, o_orderdate,
                    o_orderpriority
             FROM orders WHERE o_orderkey % 701 = 0),
           ins AS (
             SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
                    o_orderstatus, o_totalprice, o_orderdate,
                    'NEW' AS o_orderpriority
             FROM orders WHERE o_orderkey % 997 = 0)
           SELECT *, 'update_postimage' AS change_type FROM upd
           UNION ALL SELECT *, 'insert' FROM ins
           UNION ALL SELECT *, 'update_preimage'
           FROM orders WHERE o_orderkey % 701 = 0
           ORDER BY o_orderkey, change_type""",
      // the TVF is the same feed — same oracle as q_changes
      "q_changes_tvf" ->
        """WITH upd AS (
             SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                    o_totalprice * 2 AS o_totalprice, o_orderdate,
                    o_orderpriority
             FROM orders WHERE o_orderkey % 701 = 0),
           ins AS (
             SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
                    o_orderstatus, o_totalprice, o_orderdate,
                    'NEW' AS o_orderpriority
             FROM orders WHERE o_orderkey % 997 = 0)
           SELECT *, 'update_postimage' AS change_type FROM upd
           UNION ALL SELECT *, 'insert' FROM ins
           UNION ALL SELECT *, 'update_preimage'
           FROM orders WHERE o_orderkey % 701 = 0
           ORDER BY o_orderkey, change_type""",
      // per %701 key: the gain pairs with ONE of the two identical
      // lost copies (update pre/post), the other copy is a delete
      "q_changes_dupkey" ->
        """WITH k AS (SELECT * FROM orders WHERE o_orderkey % 701 = 0)
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  o_totalprice * 2 AS o_totalprice, o_orderdate,
                  'UPD' AS o_orderpriority,
                  'update_postimage' AS change_type
           FROM k
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority, 'update_preimage'
           FROM k
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority, 'delete'
           FROM k
           ORDER BY o_orderkey, change_type""",
      // per-commit attribution: the retained upsert (generation 1)
      // inserted the +1e9 keys, the retained delete (generation 2)
      // removed the %401 originals
      "q_changes_cdf" ->
        """SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
                  o_orderstatus, o_totalprice, o_orderdate,
                  o_orderpriority, 'insert' AS change_type,
                  1 AS _commit_version
           FROM orders WHERE o_orderkey % 997 = 0
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority, 'delete', 2
           FROM orders WHERE o_orderkey % 401 = 0 AND o_orderkey <> 0
           ORDER BY o_orderkey, change_type""",
      // the streaming source must reconstruct the batch feed exactly:
      // same oracle as q_changes
      "q_changes_stream" ->
        """WITH upd AS (
             SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                    o_totalprice * 2 AS o_totalprice, o_orderdate,
                    o_orderpriority
             FROM orders WHERE o_orderkey % 701 = 0),
           ins AS (
             SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
                    o_orderstatus, o_totalprice, o_orderdate,
                    'NEW' AS o_orderpriority
             FROM orders WHERE o_orderkey % 997 = 0)
           SELECT *, 'update_postimage' AS change_type FROM upd
           UNION ALL SELECT *, 'insert' FROM ins
           UNION ALL SELECT *, 'update_preimage'
           FROM orders WHERE o_orderkey % 701 = 0
           ORDER BY o_orderkey, change_type""",
      "q_sql_ddl" ->
        "SELECT 'key_nn' AS name, 'o_orderkey IS NOT NULL' AS expression",
      // VERSION AS OF 0 = the table before the retained delete
      "q_catalog" ->
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           ORDER BY o_orderkey""",
      "q_sql_delete" ->
        """SELECT * FROM orders
           WHERE o_orderkey < 1000 OR o_orderkey >= 2000
           ORDER BY o_orderkey""",
      // base (%3=0) + drop1 (%3=1, loaded once despite the re-run) +
      // drop2 (%3=2) = the whole source table
      "q_copy_into" ->
        """SELECT * FROM orders ORDER BY o_orderkey""",
      "q_copy_into_tar" ->
        "SELECT doc_id, text FROM documents ORDER BY doc_id",
      "q_copy_into_tar_multi" ->
        "SELECT doc_id, text, lang FROM documents ORDER BY doc_id",
      // the whole documents table keyed by its synthetic URI — base
      // (< 100) seeded directly, the rest through the WET landing zone
      "q_copy_into_warc" ->
        """SELECT 'http://example.com/doc/' || doc_id AS uri, text
           FROM documents ORDER BY uri""",
      // base (< 100) seeded directly, the rest through the gzip'd
      // JSONL landing zone with dump-native field names
      "q_copy_into_jsonl" ->
        "SELECT doc_id, text, lang FROM documents ORDER BY doc_id",
      // the REPLACE swapped the %3 table for the %2 table wholesale
      "q_sql_ctas" ->
        """SELECT * FROM orders WHERE o_orderkey % 2 = 0
           ORDER BY o_orderkey""",
      // the clone equals the source minus the band deleted ON THE
      // CLONE (the in-closure require pins the source unchanged)
      "q_shallow_clone" ->
        """SELECT * FROM orders
           WHERE o_orderkey < 1000 OR o_orderkey >= 2000
           ORDER BY o_orderkey""",
      // the band's even keys come back tagged, its odd keys are gone
      "q_replace_where" ->
        """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate,
                  CASE WHEN o_orderkey >= 1000 AND o_orderkey < 2000
                       THEN 'REPLACED'
                       ELSE o_orderpriority END AS o_orderpriority
           FROM orders
           WHERE o_orderkey < 1000 OR o_orderkey >= 2000
              OR o_orderkey % 2 = 0
           ORDER BY o_orderkey""",
      "q_sql_update" ->
        """SELECT o_orderkey, o_custkey,
                  CASE WHEN o_orderkey >= 1000 AND o_orderkey < 2000
                       THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
                  CASE WHEN o_orderkey >= 1000 AND o_orderkey < 2000
                       THEN o_totalprice * 2
                       ELSE o_totalprice END AS o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders ORDER BY o_orderkey""",
      // matched %401 keys deleted, matched %701 (non-%401) keys
      // updated, shifted %997 keys inserted
      "q_sql_merge_evolve" ->
        """SELECT o_orderkey,
                  round(CASE WHEN o_orderkey % 501 = 0
                             THEN o_totalprice * 2
                             ELSE o_totalprice END, 2) AS price,
                  CASE WHEN o_orderkey % 501 = 0
                       THEN 'n' || CAST(o_orderkey AS VARCHAR)
                       ELSE NULL END AS note
           FROM orders ORDER BY o_orderkey""",
      "q_sql_merge" ->
        """SELECT o_orderkey, o_custkey, o_orderstatus,
                  CASE WHEN o_orderkey % 701 = 0 AND o_orderkey % 401 <> 0
                       THEN o_totalprice * 2
                       ELSE o_totalprice END AS o_totalprice,
                  o_orderdate,
                  CASE WHEN o_orderkey % 701 = 0 AND o_orderkey % 401 <> 0
                       THEN 'MERGED'
                       ELSE o_orderpriority END AS o_orderpriority
           FROM orders WHERE o_orderkey % 401 <> 0 OR o_orderkey = 0
           UNION ALL
           SELECT o_orderkey + 2000000000, 0, 'N', o_totalprice * 3,
                  o_orderdate, 'NEW'
           FROM orders WHERE o_orderkey % 997 = 0
           ORDER BY o_orderkey""",
      // after RESTORE TO VERSION AS OF 0 the table is the pristine
      // orders copy; the restore itself archived one more generation
      "q_sql_maintenance" ->
        """SELECT 'o_orderkey' AS index_columns, count(*) AS n_rows,
                  0 AS n_constraints,
                  false AS pending_deletion_vectors,
                  2 AS retained_versions
           FROM orders""",
      "q_replica" ->
        """WITH final AS (
             SELECT o_orderkey, o_custkey,
                    CASE WHEN o_orderkey % 701 = 0 THEN 'U'
                         ELSE o_orderstatus END AS o_orderstatus,
                    CASE WHEN o_orderkey % 701 = 0 THEN o_totalprice * 2
                         ELSE o_totalprice END AS o_totalprice,
                    o_orderdate, o_orderpriority
             FROM orders
             WHERE o_orderkey % 401 <> 0 OR o_orderkey = 0
             UNION ALL
             SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus,
                    o_totalprice, o_orderdate, 'NEW'
             FROM orders WHERE o_orderkey % 997 = 0)
           SELECT * FROM final ORDER BY o_orderkey""",
      "q_graft_source" ->
        """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           ORDER BY o_orderkey""",
      "q_write_metadata" ->
        "SELECT count(*) AS n_rows, min(o_orderdate) AS lb, max(o_orderdate) AS ub FROM orders",
      "q_join_inner" ->
        """SELECT o_orderstatus, count(*) AS n,
                  round(sum(l_extendedprice), 2) AS sum_price
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY o_orderstatus ORDER BY o_orderstatus""",
      "q_join_division" ->
        """SELECT c_mktsegment, count(*) AS n,
                  round(sum(o_totalprice), 2) AS sum_price
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",
      "q_sql_division_join" ->
        """SELECT c_mktsegment, count(*) AS n,
                  round(sum(o_totalprice), 2) AS sum_price
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",
      "q_sql_division_join_left" ->
        """SELECT c_mktsegment, count(*) AS n,
                  count(o_orderkey) AS n_matched,
                  round(sum(coalesce(o_totalprice, 0)), 2) AS sum_price
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",
      "q_sql_division_join_right" ->
        """SELECT c_mktsegment, count(*) AS n,
                  count(o_orderkey) AS n_matched,
                  round(sum(coalesce(o_totalprice, 0)), 2) AS sum_price
           FROM orders RIGHT JOIN customer
             ON o_custkey = c_custkey AND o_totalprice > c_acctbal
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",
      "q_join_division_anti" ->
        """SELECT c_mktsegment, count(*) AS n,
                  round(sum(c_acctbal), 2) AS sum_bal
           FROM customer c WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 400000)
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",
      "q_sql_division_semi" ->
        """SELECT c_mktsegment, count(*) AS n
           FROM customer WHERE c_custkey IN
             (SELECT o_custkey FROM orders)
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",
      "q_sql_division_anti" ->
        """SELECT c_mktsegment, count(*) AS n,
                  round(sum(c_acctbal), 2) AS sum_bal
           FROM customer c WHERE NOT EXISTS
             (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice < c.c_acctbal)
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",
      "q_sql_division_join_agg" ->
        """SELECT o_custkey AS ckey, count(*) AS n,
                  round(sum(o_totalprice), 2) AS sum_price
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY o_custkey ORDER BY ckey LIMIT 2000""",
      "q_sql_division_sort_desc" ->
        """SELECT o_custkey AS ckey, o_orderkey, o_totalprice
           FROM orders ORDER BY ckey DESC, o_orderkey DESC
           LIMIT 5000""",
      "q_sql_division_agg" ->
        """SELECT o_custkey AS ckey, count(*) AS n,
                  round(sum(o_totalprice), 2) AS sum_price,
                  quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT),
                                0.5) AS med_cents
           FROM orders GROUP BY o_custkey
           ORDER BY ckey LIMIT 2000""",
      "q_sql_division_window" ->
        """SELECT ckey, okey, CAST(rk AS INTEGER) AS rk FROM (
             SELECT o_custkey AS ckey, o_orderkey AS okey,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS rk
             FROM orders)
           WHERE rk <= 2
           ORDER BY ckey, rk LIMIT 2000""",
      "q_sql_division_sort" ->
        """SELECT o_custkey AS ckey, o_orderkey, o_totalprice
           FROM orders ORDER BY ckey, o_orderkey LIMIT 5000""",
      "q_join_left" ->
        """SELECT o_orderpriority, count(*) AS n,
                  CAST(count(l_quantity) AS BIGINT) AS n_matched
           FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",
      "q_join_full" ->
        """SELECT count(*) AS n,
                  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_orders,
                  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_lineitem
           FROM lineitem FULL JOIN orders ON l_orderkey = o_orderkey""",
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
                  round(sum(l_quantity), 2) AS sum_qty,
                  round(sum(l_extendedprice), 2) AS sum_price,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                  round(avg(l_quantity), 4) AS avg_qty,
                  count(*) AS n
           FROM lineitem GROUP BY l_returnflag, l_linestatus
           ORDER BY l_returnflag, l_linestatus""",
      "q_window_topk" ->
        """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice
           FROM (
             SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                    CAST(row_number() OVER (
                      PARTITION BY l_returnflag
                      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
                      AS INT) AS rn
             FROM lineitem)
           WHERE rn <= 3 ORDER BY l_returnflag, rn""",
      "q_window_lag" ->
        """SELECT o_custkey, o_orderkey,
                  lag(o_totalprice, 1) OVER w AS prev_price,
                  lead(o_orderkey, 1) OVER w AS next_key,
                  CAST(ntile(4) OVER w AS INT) AS quartile
           FROM orders WHERE o_custkey <= 20
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
           ORDER BY o_custkey, o_orderkey""",
      "q_grouping_sets" ->
        """SELECT l_returnflag, l_linestatus,
                  round(sum(l_quantity), 2) AS qty
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
           ORDER BY l_returnflag ASC NULLS FIRST,
                    l_linestatus ASC NULLS FIRST""",
      "q_except_all" ->
        """SELECT nationkey, count(*) AS n FROM (
             SELECT c_nationkey AS nationkey FROM customer
             EXCEPT ALL
             SELECT s_nationkey FROM supplier)
           GROUP BY nationkey ORDER BY nationkey""",
      "q_window_running" ->
        """SELECT l_suppkey, l_orderkey, l_linenumber,
                  round(sum(l_quantity) OVER (
                    PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                    AS running_qty
           FROM lineitem WHERE l_suppkey <= 3
           ORDER BY l_suppkey, l_orderkey, l_linenumber""",
      "q_distinct" ->
        """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
           ORDER BY l_returnflag, l_linestatus""",
      "q_rollup" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n
           FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
      "q_zorder" ->
        """SELECT count(*) AS n, round(sum(l_quantity), 2) AS qty
           FROM lineitem WHERE l_partkey <= 100 AND l_suppkey <= 10""",
      "q_pivot" ->
        """SELECT l_returnflag,
                  round(sum(CASE WHEN l_linestatus = 'F'
                                 THEN l_quantity END), 2) AS "F",
                  round(sum(CASE WHEN l_linestatus = 'O'
                                 THEN l_quantity END), 2) AS "O"
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
      "q_cube" ->
        """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS qty
           FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
      "q_intersect" ->
        """SELECT c_nationkey AS nationkey FROM customer
           INTERSECT
           SELECT s_nationkey AS nationkey FROM supplier
           ORDER BY nationkey""",
      "q_except" ->
        """SELECT c_nationkey AS nationkey FROM customer
           EXCEPT
           SELECT s_nationkey AS nationkey FROM supplier
           ORDER BY nationkey""",
      "q_scalar_fns" ->
        """SELECT o_orderkey,
                  upper(o_orderstatus) AS status_u,
                  CAST(year(o_orderdate) AS INT) AS yr,
                  CAST(month(o_orderdate) AS INT) AS mo,
                  o_totalprice * 1.1 AS adj_price,
                  CAST(len(o_orderpriority) AS INT) AS prio_len,
                  concat(o_orderstatus, '-', o_orderpriority) AS tag
           FROM orders ORDER BY o_orderkey""",
      "q_topk" ->
        """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""",
      "q_sample_det" ->
        s"SELECT * FROM lineitem WHERE l_orderkey % 97 = 0 $lineitemOrderSql",
      "q_sample_exact_k" ->
        """SELECT * FROM (
             SELECT * FROM orders
             ORDER BY md5(CAST(o_orderkey AS VARCHAR)) LIMIT 500)
           ORDER BY o_orderkey""",
      "q_quota_cap" ->
        """SELECT doc_id, source, lang FROM (
             SELECT doc_id, source, lang, row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             FROM documents) WHERE rn <= 10
           ORDER BY doc_id""",
      "q_chunk" ->
        """SELECT doc_id, CAST((s - 1) // 150 AS INT) AS chunk_id,
                  CAST(s - 1 AS INT) AS chunk_start,
                  substr(text, CAST(s AS BIGINT), 200) AS chunk
           FROM (SELECT doc_id, text,
                        unnest(range(1, GREATEST(length(text), 1) + 1, 150))
                          AS s
                 FROM documents)
           ORDER BY doc_id, chunk_id""",
      "q_profile" -> {
        def one(c: String) =
          s"""SELECT '$c' AS "column", count(*) AS n_rows,
                     count(*) - count($c) AS n_nulls,
                     count(DISTINCT $c) AS n_distinct,
                     CAST(min($c) AS VARCHAR) AS min_value,
                     CAST(max($c) AS VARCHAR) AS max_value FROM documents"""
        Seq("doc_id", "lang", "n_chars", "source", "text")
          .map(one).mkString("", " UNION ALL ", """ ORDER BY "column"""")
      },
      "q_token_rarity" ->
        """WITH toks AS (
             SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             FROM documents),
           nz AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
           counts AS (SELECT tok, count(*) AS tok_n FROM nz GROUP BY tok)
           SELECT doc_id, count(*) AS n_tokens,
                  CAST(sum(tok_n) AS BIGINT) AS sum_tok_freq,
                  min(tok_n) AS min_tok_freq
           FROM nz JOIN counts USING (tok)
           GROUP BY doc_id ORDER BY doc_id""",
      "q_heavy_hitters" ->
        """SELECT l_partkey, count(*) AS n FROM lineitem
           GROUP BY l_partkey
           HAVING count(*) >= GREATEST(30,
             CEIL(2.0 * (SELECT count(*) FROM lineitem) / 4096))
           ORDER BY n DESC, l_partkey""",
      "q_tpch_q5" ->
        """SELECT n_name,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
           JOIN supplier ON l_suppkey = s_suppkey
                        AND c_nationkey = s_nationkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA'
           GROUP BY n_name ORDER BY revenue DESC, n_name""",
      "q_tpch_q4" ->
        """SELECT o_orderpriority, count(*) AS order_count
           FROM orders o
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1996-04-01'
             AND EXISTS (
               SELECT 1 FROM lineitem l
               WHERE l.l_orderkey = o.o_orderkey
                 AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",
      "q_tpch_q14" ->
        """SELECT 100.0 *
                  sum(CASE WHEN p_type = 'PROMO'
                      THEN CAST(round(l_extendedprice * 100) AS BIGINT) *
                           CAST(round((1 - l_discount) * 100) AS BIGINT)
                      ELSE 0 END) /
                  sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      CAST(round((1 - l_discount) * 100) AS BIGINT))
                    AS promo_revenue_pct
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-02-01'""",
      "q_tpch_q10" ->
        """SELECT c_custkey, c_name,
                  sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      CAST(round((1 - l_discount) * 100) AS BIGINT))
                    / 10000.0 AS revenue,
                  c_acctbal, n_name
           FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           JOIN nation ON c_nationkey = n_nationkey
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1996-04-01'
             AND l_returnflag = 'R'
           GROUP BY c_custkey, c_name, c_acctbal, n_name
           ORDER BY revenue DESC, c_custkey LIMIT 20""",
      "q_tpch_q18" ->
        """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                  round(sum(l_quantity), 2) AS sum_qty
           FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
           WHERE o_orderkey IN (
             SELECT l_orderkey FROM lineitem
             GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
           GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
           ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
           LIMIT 100""",
      "q_tpch_q17" ->
        """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
           FROM lineitem JOIN part ON p_partkey = l_partkey
           WHERE p_brand = 'Brand#13'
             AND l_quantity < (
               SELECT 0.2 * avg(l_quantity) FROM lineitem l2
               WHERE l2.l_partkey = p_partkey)""",
      "q_tpch_q21" ->
        """SELECT s_name, count(*) AS numwait FROM (
             SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
             FROM lineitem l1 JOIN orders ON o_orderkey = l1.l_orderkey
             WHERE o_orderstatus = 'F'
               AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
               AND EXISTS (
                 SELECT 1 FROM lineitem l2
                 WHERE l2.l_orderkey = l1.l_orderkey
                   AND l2.l_suppkey <> l1.l_suppkey)
               AND NOT EXISTS (
                 SELECT 1 FROM lineitem l3
                 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                 WHERE l3.l_orderkey = l1.l_orderkey
                   AND l3.l_suppkey <> l1.l_suppkey
                   AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
           ) w JOIN supplier ON s_suppkey = l_suppkey
           GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
      "q_tpch_q13" ->
        """SELECT c_count, count(*) AS custdist FROM (
             SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer LEFT OUTER JOIN orders
               ON c_custkey = o_custkey
              AND o_orderpriority <> '1-URGENT'
             GROUP BY c_custkey)
           GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
      "q_tpch_q20" ->
        """SELECT s_suppkey, s_name FROM supplier
           WHERE s_suppkey IN (
             SELECT pa.l_suppkey FROM
               (SELECT l_suppkey, l_partkey, sum(l_quantity) AS q96
                FROM lineitem
                WHERE l_partkey IN (
                    SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                GROUP BY l_suppkey, l_partkey) pa
             JOIN
               (SELECT l_partkey, sum(l_quantity) AS qt
                FROM lineitem
                WHERE l_partkey IN (
                    SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                GROUP BY l_partkey) pt
             ON pa.l_partkey = pt.l_partkey
             WHERE pa.q96 > 0.5 * pt.qt)
           AND s_nationkey IN (
             SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
           ORDER BY s_suppkey""",
      "q_tpch_q2" ->
        """WITH shipped AS (
             SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
           rsupp AS (
             SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
             JOIN nation ON s_nationkey = n_nationkey
             WHERE n_regionkey = 1)
           SELECT p_partkey, p_brand, s_name, s_acctbal, n_name
           FROM part
           JOIN shipped ON p_partkey = l_partkey
           JOIN rsupp ON l_suppkey = s_suppkey
           WHERE p_size <= 3 AND p_type = 'SMALL'
             AND s_acctbal = (
               SELECT min(s2.s_acctbal) FROM shipped sh2
               JOIN rsupp s2 ON sh2.l_suppkey = s2.s_suppkey
               WHERE sh2.l_partkey = p_partkey)
           ORDER BY s_acctbal, s_name, p_partkey LIMIT 100""",
      "q_tpch_q8" ->
        """SELECT o_year,
                  round(sum(CASE WHEN supp_nation = 'NATION_3'
                            THEN volume ELSE 0 END) * 1.0 / sum(volume), 6)
                    AS mkt_share
           FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                        CAST(round(l_extendedprice * 100) AS BIGINT) *
                        CAST(round((1 - l_discount) * 100) AS BIGINT)
                          AS volume,
                        n2.n_name AS supp_nation
                 FROM part
                 JOIN lineitem ON p_partkey = l_partkey
                 JOIN supplier ON s_suppkey = l_suppkey
                 JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation n1 ON c_nationkey = n1.n_nationkey
                 JOIN region ON n1.n_regionkey = r_regionkey
                 JOIN nation n2 ON s_nationkey = n2.n_nationkey
                 WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
                   AND o_orderdate >= TIMESTAMP '1995-01-01'
                   AND o_orderdate < TIMESTAMP '1997-01-01')
           GROUP BY o_year ORDER BY o_year""",
      "q_tpch_q9" ->
        """SELECT nation, o_year, sum(amount) / 10000.0 AS sum_profit
           FROM (SELECT n_name AS nation,
                        CAST(year(o_orderdate) AS BIGINT) AS o_year,
                        CAST(round(l_extendedprice * 100) AS BIGINT) *
                        CAST(round((1 - l_discount) * 100) AS BIGINT) -
                        CAST(round(p_retailprice * 100) AS BIGINT) *
                        CAST(round(l_quantity) AS BIGINT) * 60 AS amount
                 FROM part
                 JOIN lineitem ON p_partkey = l_partkey
                 JOIN supplier ON s_suppkey = l_suppkey
                 JOIN orders ON l_orderkey = o_orderkey
                 JOIN nation ON s_nationkey = n_nationkey
                 WHERE p_name LIKE '%red%')
           GROUP BY nation, o_year ORDER BY nation, o_year DESC""",
      "q_tpch_q11" ->
        """WITH v AS (
             SELECT l_partkey,
                    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                        CAST(round((1 - l_discount) * 100) AS BIGINT))
                      AS value_cents
             FROM lineitem
             WHERE l_suppkey IN (
               SELECT s_suppkey FROM supplier
               JOIN nation ON s_nationkey = n_nationkey
               WHERE n_name IN ('NATION_3', 'NATION_4'))
             GROUP BY l_partkey)
           SELECT l_partkey, value_cents / 10000.0 AS value
           FROM v
           WHERE value_cents * 500 > (SELECT sum(value_cents) FROM v)
           ORDER BY value DESC, l_partkey""",
      "q_tpch_q12" ->
        """SELECT l_linestatus,
                  CAST(sum(CASE WHEN o_orderpriority IN
                       ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                    AS BIGINT) AS high_line_count,
                  CAST(sum(CASE WHEN o_orderpriority NOT IN
                       ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                    AS BIGINT) AS low_line_count
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
             AND l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
           GROUP BY l_linestatus ORDER BY l_linestatus""",
      "q_tpch_q6" ->
        """SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      CAST(round(l_discount * 100) AS BIGINT)) / 10000.0
                    AS revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
             AND l_discount >= 0.02 AND l_discount <= 0.04
             AND l_quantity < 24""",
      "q_tpch_q7" ->
        """SELECT supp_nation, cust_nation, l_year,
                  sum(volume) / 10000.0 AS revenue
           FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                        CAST(year(l_shipdate) AS BIGINT) AS l_year,
                        CAST(round(l_extendedprice * 100) AS BIGINT) *
                        CAST(round((1 - l_discount) * 100) AS BIGINT)
                          AS volume
                 FROM supplier
                 JOIN lineitem ON s_suppkey = l_suppkey
                 JOIN orders ON o_orderkey = l_orderkey
                 JOIN customer ON c_custkey = o_custkey
                 JOIN nation n1 ON s_nationkey = n1.n_nationkey
                 JOIN nation n2 ON c_nationkey = n2.n_nationkey
                 WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                   AND l_shipdate >= TIMESTAMP '1995-01-01'
                   AND l_shipdate < TIMESTAMP '1997-01-01')
           GROUP BY supp_nation, cust_nation, l_year
           ORDER BY supp_nation, cust_nation, l_year""",
      "q_tpch_q15" ->
        """WITH revenue AS (
             SELECT l_suppkey AS supplier_no,
                    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                        CAST(round((1 - l_discount) * 100) AS BIGINT))
                      AS total_cents
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate < TIMESTAMP '1996-04-01'
             GROUP BY l_suppkey)
           SELECT s_suppkey, s_name, total_cents / 10000.0 AS total_revenue
           FROM supplier JOIN revenue ON s_suppkey = supplier_no
           WHERE total_cents = (SELECT max(total_cents) FROM revenue)
           ORDER BY s_suppkey""",
      "q_tpch_q16" ->
        """SELECT p_brand, p_type, p_size,
                  count(DISTINCT l_suppkey) AS supplier_cnt
           FROM lineitem JOIN part ON p_partkey = l_partkey
           WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
             AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
             AND l_suppkey NOT IN (
               SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
           GROUP BY p_brand, p_type, p_size
           ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
      "q_tpch_q19" ->
        """SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                      CAST(round((1 - l_discount) * 100) AS BIGINT))
                    / 10000.0 AS revenue
           FROM lineitem JOIN part ON p_partkey = l_partkey
           WHERE (p_brand = 'Brand#12' AND p_size >= 1 AND p_size <= 5
                  AND l_quantity >= 1 AND l_quantity <= 11)
              OR (p_brand = 'Brand#23' AND p_size >= 1 AND p_size <= 10
                  AND l_quantity >= 10 AND l_quantity <= 20)
              OR (p_brand = 'Brand#34' AND p_size >= 1 AND p_size <= 15
                  AND l_quantity >= 20 AND l_quantity <= 30)""",
      "q_tpch_q22" ->
        """WITH pos AS (
             SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
                    count(*) AS c
             FROM customer WHERE c_acctbal > 0.0 AND c_nationkey <= 7)
           SELECT cntrycode, count(*) AS numcust,
                  sum(bal_cents) / 100.0 AS totacctbal
           FROM (SELECT c_nationkey AS cntrycode,
                        CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
                        c_custkey
                 FROM customer
                 WHERE c_nationkey <= 7
                   AND CAST(round(c_acctbal * 100) AS BIGINT) *
                       (SELECT c FROM pos) > (SELECT s FROM pos)
                   AND NOT EXISTS (
                     SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey
                       AND o_orderdate >= TIMESTAMP '2000-01-01'))
           GROUP BY cntrycode ORDER BY cntrycode""",
      "q_tpch_q3" ->
        """SELECT o_orderkey,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
           WHERE c_mktsegment = 'BUILDING'
           GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""",
      "q_join_semi" ->
        """SELECT c_custkey, c_name FROM customer
           WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           ORDER BY c_custkey""",
      "q_join_anti" ->
        """SELECT c_custkey, c_name FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           ORDER BY c_custkey""",
      "q_join_salted" ->
        """SELECT o_orderpriority, count(*) AS n,
                  round(sum(l_quantity), 2) AS sum_qty
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",
      "q_sketch_hll" ->
        """SELECT l_returnflag,
                  count(DISTINCT l_orderkey) AS exact_n,
                  true AS within_5pct
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
      "q_ann_pq" ->
        "SELECT CAST(10 AS BIGINT) AS n_queries, true AS recall_floor_met",
      "q_bm25" ->
        """WITH p AS (
             SELECT doc_id,
                    string_split_regex(lower(trim(text)), '\s+') AS w,
                    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS dl
             FROM documents),
           stats AS (
             SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n FROM p),
           toks AS (
             SELECT doc_id, unnest(w) AS term FROM p
             WHERE true),
           ft AS (
             SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
             FROM toks WHERE term IN ('spark', 'join', 'window')
             GROUP BY doc_id, term),
           dfreq AS (
             SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
             FROM toks WHERE term IN ('spark', 'join', 'window')
             GROUP BY term),
           scored AS (
             SELECT ft.doc_id,
                    sum(ln((s.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1)
                        * ft.tf * (1.2 + 1)
                        / (ft.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / s.avgdl)))
                      AS score
             FROM ft
             JOIN dfreq USING (term)
             JOIN p ON ft.doc_id = p.doc_id
             CROSS JOIN stats s
             GROUP BY ft.doc_id)
           SELECT doc_id, round(score, 4) AS bm25 FROM scored
           ORDER BY bm25 DESC, doc_id LIMIT 100""",
      // Exact percentile re-derived with Spark's interpolation
      // arithmetic — (hi - p)*v_lo + (p - lo)*v_hi over the sorted
      // expansion, p = (n-1)*q — instead of quantile_cont's
      // lo + (hi - lo)*frac, whose different double rounding lands on
      // the other side of a cent boundary for some generated data;
      // final rounding is the portable floor(x*100 + 0.5)/100 on both
      // sides (see the Spark-side comment).
      "q_sketch_percentile" ->
        """WITH s AS (
             SELECT l_returnflag, l_extendedprice AS v,
                    row_number() OVER (PARTITION BY l_returnflag
                                       ORDER BY l_extendedprice) - 1 AS i,
                    count(*) OVER (PARTITION BY l_returnflag) AS n
             FROM lineitem),
           q AS (
             SELECT l_returnflag,
                    sum(CASE WHEN floor((n-1) * 0.5) = ceil((n-1) * 0.5)
                                  AND i = CAST(floor((n-1) * 0.5) AS BIGINT)
                             THEN v
                             WHEN i = CAST(floor((n-1) * 0.5) AS BIGINT)
                             THEN (ceil((n-1) * 0.5) - (n-1) * 0.5) * v
                             WHEN i = CAST(ceil((n-1) * 0.5) AS BIGINT)
                             THEN ((n-1) * 0.5 - floor((n-1) * 0.5)) * v
                        END) AS p50,
                    sum(CASE WHEN floor((n-1) * 0.95) = ceil((n-1) * 0.95)
                                  AND i = CAST(floor((n-1) * 0.95) AS BIGINT)
                             THEN v
                             WHEN i = CAST(floor((n-1) * 0.95) AS BIGINT)
                             THEN (ceil((n-1) * 0.95) - (n-1) * 0.95) * v
                             WHEN i = CAST(ceil((n-1) * 0.95) AS BIGINT)
                             THEN ((n-1) * 0.95 - floor((n-1) * 0.95)) * v
                        END) AS p95
             FROM s GROUP BY l_returnflag)
           SELECT l_returnflag,
                  floor(p50 * 100 + 0.5) / 100 AS p50_exact,
                  floor(p95 * 100 + 0.5) / 100 AS p95_exact,
                  true AS within_1pct
           FROM q ORDER BY l_returnflag""",
      "q_asof_join" ->
        """SELECT e.event_id, e.user_id, e.event_type,
                  p.value AS last_purchase_value,
                  p.event_id AS last_purchase_event
           FROM events e
           ASOF LEFT JOIN (
             SELECT user_id, ts, value, event_id FROM events
             WHERE event_type = 'purchase') p
             ON e.user_id = p.user_id AND e.ts >= p.ts
           ORDER BY e.event_id""",
      "q_range_join" ->
        """SELECT e.user_id,
                  count(DISTINCT e.event_id) AS n_affected
           FROM events e JOIN events x
             ON e.user_id = x.user_id AND x.event_type = 'error'
            AND e.ts >= x.ts AND e.ts <= x.ts + INTERVAL 10 MINUTE
           GROUP BY e.user_id ORDER BY e.user_id""",
      "q_events_tumbling" ->
        """SELECT date_trunc('hour', ts) AS window_start, event_type,
                  count(*) AS n, round(sum(value), 3) AS total_value
           FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
      // Sliding windows via explicit window index arithmetic: event at
      // epoch e belongs to windows k*slide <= e < k*slide + size, i.e.
      // k in [floor((e-size)/slide)+1, floor(e/slide)] — integer
      // truncation of e is safe because floor((x)/n) = floor(floor(x)/n)
      // for integer n > 0.
      "q_events_sliding" ->
        """WITH ev AS (
             SELECT CAST(floor(epoch(ts)) AS BIGINT) AS e, event_type
             FROM events),
           w AS (
             SELECT event_type,
                    unnest(range(
                      CAST(floor((e - 3600.0) / 1800.0) + 1 AS BIGINT),
                      CAST(floor(e / 1800.0) + 1 AS BIGINT))) AS k
             FROM ev)
           SELECT make_timestamp(k * 1800 * 1000000) AS window_start,
                  make_timestamp((k * 1800 + 3600) * 1000000) AS window_end,
                  event_type, count(*) AS n
           FROM w GROUP BY 1, 2, 3 ORDER BY 1, 3""",
      "q_events_sessions" ->
        """WITH g AS (
             SELECT user_id, ts, event_id,
                    CASE WHEN lag(ts) OVER w IS NULL
                           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                         THEN 1 ELSE 0 END AS new_session
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           sess AS (
             SELECT user_id,
                    sum(new_session) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS session_id
             FROM g),
           per AS (
             SELECT user_id, session_id, count(*) AS n_ev
             FROM sess GROUP BY user_id, session_id)
           SELECT user_id, count(*) AS n_sessions,
                  CAST(max(n_ev) AS BIGINT) AS max_session_events
           FROM per GROUP BY user_id ORDER BY user_id""",
      "q_dedup_exact" ->
        """SELECT md5(text) AS content_hash, min(doc_id) AS doc_id,
                  count(*) AS copies
           FROM documents GROUP BY md5(text) ORDER BY doc_id""",
      "q_dedup_minhash" -> shingleCte(""),
      // the full exact pair set, restricted to pairs touching the
      // batch (doc_id % 10 = 0) the incremental query dedups
      "q_dedup_minhash_inc" -> s"""
        SELECT "idA", "idB", jaccard FROM (${shingleCte("")}) t
        WHERE "idA" % 10 = 0 OR "idB" % 10 = 0
        ORDER BY "idA", "idB"""",
      // the ingestion policy recomputed over the exact pair set:
      // corpus-vs-batch pairs drop the batch side, batch-internal
      // pairs drop the larger id
      "q_dedup_batch" -> s"""
        WITH t AS (${shingleCte("")}),
        losers AS (
          SELECT CASE WHEN "idA" % 10 = 0 AND "idB" % 10 = 0 THEN "idB"
                      WHEN "idA" % 10 = 0 THEN "idA"
                      ELSE "idB" END AS doc_id
          FROM t WHERE "idA" % 10 = 0 OR "idB" % 10 = 0)
        SELECT doc_id, text FROM documents
        WHERE doc_id % 10 = 0
          AND doc_id NOT IN (SELECT doc_id FROM losers)
        ORDER BY doc_id""",
      // forget %50==0, re-ingest exact copies under shifted ids:
      // the non-forgotten docs keep their rows, and a shifted copy
      // survives unless its ORIGINAL near-dups a live (%50<>0) doc
      // or a smaller forgotten one — the batch loser policy in the
      // original id space (the shift preserves order)
      "q_forget_reingest" -> s"""
        WITH t AS (${shingleCte("")}),
        losers AS (
          SELECT CASE WHEN "idA" % 50 = 0 AND "idB" % 50 = 0 THEN "idB"
                      WHEN "idA" % 50 = 0 THEN "idA"
                      ELSE "idB" END AS doc_id
          FROM t WHERE "idA" % 50 = 0 OR "idB" % 50 = 0)
        SELECT doc_id, text FROM (
          SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text FROM documents
          WHERE doc_id % 50 = 0
            AND doc_id NOT IN (SELECT doc_id FROM losers))
        ORDER BY doc_id""",
      // ANN-gated vector ingestion: every planted exact copy drops
      // (its original is indexed — cosine 1.0), every organic vector
      // survives (no sf pair reaches 0.9999; q_dedup_embedding pins
      // zero pairs even at 0.9 over this id range)
      "q_vector_ingest" ->
        "SELECT vec_id FROM embeddings WHERE vec_id < 800 ORDER BY vec_id",
      // the streamed single-batch ingestion: corpus ∪ the batch
      // survivors under the same loser policy as q_dedup_batch
      "q_stream_ingest" -> s"""
        WITH t AS (${shingleCte("")}),
        losers AS (
          SELECT CASE WHEN "idA" % 10 = 0 AND "idB" % 10 = 0 THEN "idB"
                      WHEN "idA" % 10 = 0 THEN "idA"
                      ELSE "idB" END AS doc_id
          FROM t WHERE "idA" % 10 = 0 OR "idB" % 10 = 0)
        SELECT doc_id, text FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        ORDER BY doc_id""",
      "q_dedup_ngram" -> shingleCte(""),
      // Word 4-gram overlap between the corpus (doc_id % 97 != 0) and
      // the held-out set (doc_id % 97 == 0); same clamped-slice
      // construction as shingleCte, n=4. The Bloom-prefiltered
      // variant verifies candidates exactly, so it shares the oracle.
      "q_decontaminate" -> decontaminateOracle,
      "q_decontaminate_bloom" -> decontaminateOracle,
      // Same pair derivation as shingleCte, then connected components
      // as a recursive reachability closure with min-id labels — the
      // CTE through `lab` is shared with q_dedup_corpus.
      "q_dedup_clusters" -> s"""$clusterLabCte,
        szs AS (
          SELECT cluster_id, count(*) AS cluster_size
          FROM lab GROUP BY cluster_id)
        SELECT l.doc_id, l.cluster_id, s.cluster_size
        FROM lab l JOIN szs s USING (cluster_id)
        ORDER BY l.doc_id""",
      // end-to-end dedup: survivors = corpus minus non-canonical
      // cluster members
      "q_dedup_corpus" -> s"""$clusterLabCte
        SELECT doc_id, n_chars FROM documents
        WHERE doc_id NOT IN
          (SELECT doc_id FROM lab WHERE doc_id != cluster_id)
        ORDER BY doc_id""",
      // the same clusters, quality keeper: per cluster the max
      // n_chars wins (ties -> smaller id), everyone else drops
      "q_dedup_quality" -> s"""$clusterLabCte,
        ranked AS (
          SELECT l.doc_id,
                 row_number() OVER (PARTITION BY l.cluster_id
                   ORDER BY d.n_chars DESC, l.doc_id) AS rn
          FROM lab l JOIN documents d USING (doc_id))
        SELECT doc_id, n_chars FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
        ORDER BY doc_id""",
      // ExactSubstr: cut the merged spans out of each text (string_agg
      // of the kept segments + the tail past the last span); docs
      // without spans pass through the left join untouched
      "q_dedup_spans" -> (spanMergedCte + spanCutTail),
      // incremental == one-shot on the batch half (see spanCutTailBatch)
      "q_dedup_spans_inc" -> (spanMergedCte + spanCutTailBatch),
      // composed self-trim + cross-doc from one tokenization
      "q_dedup_spans_both" -> (spanBothMergedCte + spanCutTail),
      // the within-doc (self-repetition) variant: the planted twice-
      // repeated passage loses its second copy, everything else
      // rederives identically
      "q_dedup_spans_self" -> (spanSelfMergedCte + spanCutTail),
      // the audit rows: every merged span with its exact substring
      "q_span_audit" -> (spanMergedCte + """
        SELECT m.doc_id, CAST(m.s AS INT) AS span_start,
               CAST(m.e AS INT) AS span_end,
               substr(d.t, CAST(m.s + 1 AS INT),
                 CAST(m.e - m.s AS INT)) AS removed
        FROM spmerged m JOIN d USING (doc_id)
        ORDER BY doc_id, span_start"""),
      // Full SimHash rederivation: md5-prefix token hash (bit-identical
      // to Spark's Dedup.md5Hash64), per-bit majority vote, 64-bit
      // fingerprint via bit_or, exhaustive pair scan (the 4-chunk
      // blocking in Spark is lossless for hamming <= 3 by pigeonhole,
      // so all-pairs here yields the same rows).
      "q_dedup_simhash" ->
        """WITH docs AS (
             SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
             FROM documents),
           toks AS (SELECT doc_id, unnest(w) AS tkn FROM docs),
           tok AS (
             SELECT doc_id,
                    ('0x' || substr(md5(tkn), 1, 16))::UBIGINT AS h
             FROM toks),
           sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
           bits AS (
             SELECT doc_id, b.i AS i,
                    sum(((h >> b.i) & 1)::BIGINT) AS c
             FROM tok CROSS JOIN (SELECT unnest(range(64)) AS i) b
             GROUP BY doc_id, b.i),
           sim AS (
             SELECT bits.doc_id,
                    bit_or(CASE WHEN c * 2 > n THEN 1::UBIGINT << CAST(i AS INT)
                                ELSE 0::UBIGINT END) AS sim
             FROM bits JOIN sizes USING (doc_id)
             GROUP BY bits.doc_id)
           SELECT a.doc_id AS "idA", b.doc_id AS "idB",
                  CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
           FROM sim a JOIN sim b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.sim, b.sim)) <= 3
           ORDER BY "idA", "idB"""",
      // Thresholded contract from the Spark-side recall grader
      // (deterministic: seeded planes, fixed data): recall@5 must meet
      // a floor that holds at EVERY verification scale factor, so the
      // oracle row is SF-independent.
      "q_ann_lsh" ->
        "SELECT CAST(10 AS BIGINT) AS n_queries, true AS recall_floor_met",
      "q_ann_ivf" ->
        "SELECT CAST(10 AS BIGINT) AS n_queries, true AS recall_floor_met",
      "q_ann_ivfpq" ->
        "SELECT CAST(10 AS BIGINT) AS n_queries, true AS recall_floor_met",
      "q_ann_ivf_indexed" ->
        "SELECT CAST(10 AS BIGINT) AS n_queries, true AS recall_floor_met",
      "q_ann_index_add" ->
        "SELECT CAST(10 AS BIGINT) AS n_queries, true AS recall_floor_met",
      // URL canonicalization rederived with the same lookaround-free
      // regex algebra (RE2-safe); coalesce() papers over DuckDB's
      // NULL for array_to_string([]) where Spark's array_join gives ''
      "q_url_canon" ->
        """WITH u AS (
             SELECT doc_id,
               CASE doc_id % 6
                 WHEN 0 THEN 'HTTP://User:Pw@WWW.Example' || (doc_id % 5) || '.COM:80/Path/' || doc_id || '?utm_source=feed&id=' || doc_id || '&fbclid=zz#frag'
                 WHEN 1 THEN 'https://Site' || (doc_id % 5) || '.org:443/x?id=' || doc_id || '&utm_campaign=x'
                 WHEN 2 THEN 'https://site' || (doc_id % 5) || '.org:8443/keep?gclid=1'
                 WHEN 3 THEN 'ftp://Mixed.Case.Net/data/' || doc_id
                 WHEN 4 THEN 'not a url ' || doc_id
                 ELSE 'http://bare' || (doc_id % 5) || '.com' END AS url
             FROM documents),
           uparts AS (
             SELECT doc_id, url,
               lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
               regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1) AS auth,
               regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1) AS rest
             FROM u),
           uparts2 AS (
             SELECT doc_id, url, scheme,
               lower(regexp_extract(auth, '^(?:[^@]*@)?([^:]*)', 1)) AS host,
               regexp_extract(auth, ':([0-9]+)$', 1) AS port,
               regexp_extract(rest, '^([^?]*)', 1) AS path,
               regexp_extract(rest, '\?(.*)$', 1) AS query
             FROM uparts),
           uparts3 AS (
             SELECT doc_id, url, scheme, host, path,
               CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                      OR (scheme = 'https' AND port = '443'))
                    THEN ':' || port ELSE '' END AS portpart,
               coalesce(array_to_string(list_filter(string_split(query, '&'),
                 p -> NOT regexp_matches(p,
                   '^(utm_[^=&]*|gclid|fbclid|msclkid|mc_cid|mc_eid)(=|$)')),
                 '&'), '') AS q
             FROM uparts2)
           SELECT doc_id, url,
             CASE WHEN host = '' THEN NULL ELSE host END AS host,
             CASE WHEN scheme = '' THEN url
                  ELSE scheme || '://' || host || portpart ||
                       (CASE WHEN path = '' THEN '/' ELSE path END) ||
                       (CASE WHEN q = '' THEN '' ELSE '?' || q END) END AS canon
           FROM uparts3 ORDER BY doc_id""",
      // DSIR rederived end to end: both trigram models (target =
      // English slice, raw = corpus), the per-doc log importance
      // weight, the id-derived Gumbel key, the top-100 selection
      "q_dsir_select" ->
        """WITH d AS (
             SELECT doc_id, lang,
                    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
             FROM documents),
           g AS (
             SELECT doc_id, lang,
                    unnest(list_transform(
                      range(1, greatest(len(t) - 2, 1) + 1),
                      i -> (('0x' || substr(md5(substr(t, CAST(i AS INT), 3)),
                             1, 16))::UBIGINT >> 2))) AS gram
             FROM d),
           tmodel AS (
             SELECT gram, count(*) AS c FROM g WHERE lang = 'en'
             GROUP BY gram ORDER BY c DESC, gram LIMIT 4096),
           rmodel AS (
             SELECT gram, count(*) AS c FROM g
             GROUP BY gram ORDER BY c DESC, gram LIMIT 4096),
           dt AS (SELECT CAST(sum(c) + count(*) + 1 AS DOUBLE) AS den
                  FROM tmodel),
           dr AS (SELECT CAST(sum(c) + count(*) + 1 AS DOUBLE) AS den
                  FROM rmodel),
           w AS (
             SELECT g.doc_id,
                    sum(log2(coalesce(t.c, 0) + 1)
                        - log2(coalesce(r.c, 0) + 1))
                      + count(*) * (log2((SELECT den FROM dr))
                                    - log2((SELECT den FROM dt))) AS logw
             FROM g LEFT JOIN tmodel t USING (gram)
                    LEFT JOIN rmodel r USING (gram)
             GROUP BY g.doc_id),
           sel AS (
             SELECT doc_id, logw
             FROM w
             ORDER BY logw * ln(2) - ln(-ln(
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                + 0.5) / 4294967296.0)) DESC, doc_id
             LIMIT 100)
           SELECT doc_id, round(logw, 4) AS importance
           FROM sel ORDER BY doc_id""",
      // the trigram LM rederived end to end: same normalization,
      // same 62-bit md5-prefix gram hashes, same deterministic
      // top-4096 truncation, same add-one smoothing and log2 algebra
      "q_lm_score" ->
        """WITH d AS (
             SELECT doc_id,
                    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
             FROM documents),
           g AS (
             SELECT doc_id,
                    unnest(list_transform(
                      range(1, greatest(len(t) - 2, 1) + 1),
                      i -> (('0x' || substr(md5(substr(t, CAST(i AS INT), 3)),
                             1, 16))::UBIGINT >> 2))) AS gram
             FROM d),
           cnt AS (SELECT gram, count(*) AS c FROM g GROUP BY gram),
           model AS (
             SELECT gram, c FROM cnt ORDER BY c DESC, gram LIMIT 4096),
           dd AS (
             SELECT CAST(sum(c) + count(*) + 1 AS DOUBLE) AS den
             FROM model)
           SELECT g.doc_id,
                  round(log2((SELECT den FROM dd))
                        - avg(log2(coalesce(m.c, 0) + 1)), 4) AS lm_score
           FROM g LEFT JOIN model m USING (gram)
           GROUP BY g.doc_id ORDER BY g.doc_id""",
      // first-match quality rules, each ANSI/RE2-rederivable
      "q_quality_filter" ->
        """WITH t AS (
             SELECT doc_id,
                    len(string_split_regex(trim(text), '\s+')) AS toks,
                    len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                      / greatest(len(text), 1) AS alpha,
                    len(list_distinct(
                        string_split_regex(trim(lower(text)), '\s+'))) * 1.0
                      / greatest(
                          len(string_split_regex(trim(lower(text)), '\s+')),
                          1) AS dr
             FROM documents),
           r AS (
             SELECT doc_id,
                    CASE WHEN toks < 5 THEN 'too_short'
                         WHEN alpha < 0.5 THEN 'low_alpha'
                         WHEN dr < 0.3 THEN 'repetitive'
                         ELSE 'ok' END AS reason
             FROM t)
           SELECT doc_id, reason, reason = 'ok' AS keep
           FROM r ORDER BY doc_id""",
      // Repetition signals: exact-line groups (char-weighted, len =
      // code points in both engines) + the clamped-slice trigram
      // construction with duplicates KEPT; every fraction is a
      // quotient of exact integers, so IEEE division bit-matches.
      "q_quality_repetition" ->
        """WITH lines AS (
             SELECT doc_id, unnest(string_split(text, chr(10))) AS ln
             FROM documents),
           lc AS (
             SELECT doc_id, ln, count(*) AS c, len(ln) AS w
             FROM lines GROUP BY doc_id, ln),
           lf AS (
             SELECT doc_id,
                    CAST(sum(CASE WHEN c > 1 THEN w * c ELSE 0 END) AS DOUBLE)
                      / CAST(greatest(sum(w * c), 1) AS DOUBLE)
                      AS dup_line_frac
             FROM lc GROUP BY doc_id),
           docs AS (
             SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
             FROM documents),
           grams AS (
             SELECT doc_id,
                    unnest(list_transform(
                      range(1, greatest(len(w)-2, 1)+1),
                      i -> array_to_string(
                             list_slice(w, CAST(i AS INT), CAST(i AS INT)+2),
                             ' '))) AS g
             FROM docs),
           gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
           ng AS (
             SELECT doc_id,
                    CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
                      AS top_ngram_frac,
                    CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
                      AS dup_ngram_frac
             FROM gc GROUP BY doc_id)
           SELECT l.doc_id, l.dup_line_frac, n.top_ngram_frac, n.dup_ngram_frac
           FROM lf l JOIN ng n ON l.doc_id = n.doc_id
           ORDER BY l.doc_id""",
      // md5-derived uniform fraction vs per-stratum target — the
      // keep decision is bit-identical across engines
      "q_sample_stratified" ->
        """SELECT doc_id, lang FROM documents
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                   / 4294967296.0
                 < CASE lang WHEN 'en' THEN 0.5
                             WHEN 'zh' THEN 0.25
                             ELSE 0.1 END
           ORDER BY doc_id""",
      "q_split_assign" ->
        """SELECT doc_id,
                  CASE WHEN f < 0.75 THEN 'train'
                       WHEN f < 0.875 THEN 'valid'
                       ELSE 'test' END AS split
           FROM (SELECT doc_id,
                        ('0x' || substr(md5('split1:' ||
                           CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                          / 4294967296.0 AS f
                 FROM documents)
           ORDER BY doc_id""",
      "q_mixture_temperature" ->
        """WITH c AS (SELECT lang, count(*) AS n
                      FROM documents GROUP BY lang),
                m AS (SELECT min(n) AS nmin FROM c)
           SELECT doc_id, source, lang
           FROM documents JOIN c USING (lang), m
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                   / 4294967296.0
                 < sqrt(CAST(nmin AS DOUBLE) / n)
           ORDER BY doc_id""",
      // single-merge BPE closed form (see the query comment):
      // count = utf8 bytes - non-overlapping "ab" occurrences
      "q_bpe_count" ->
        """SELECT doc_id,
                  octet_length(encode(coalesce(text, '')))
                  - (octet_length(encode(coalesce(text, '')))
                     - octet_length(encode(
                         replace(coalesce(text, ''), 'ab', ''))))
                    // 2 AS n_bpe
           FROM documents ORDER BY doc_id""",
      "q_token_budget" ->
        """WITH tot AS (SELECT source, sum(n_chars) AS t
                        FROM documents GROUP BY source),
           cand AS (
             SELECT d.doc_id, d.source, d.n_chars, t.t
             FROM documents d JOIN tot t USING (source)
             WHERE t.t > 7500
               AND ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
                     / 4294967296.0
                   < least(1.0, 2.0 * 7500 / t.t)),
           filled AS (
             SELECT doc_id, source, n_chars,
                    sum(n_chars) OVER (PARTITION BY source
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS cum
             FROM cand)
           SELECT * FROM (
             SELECT d.doc_id, d.source, d.n_chars
             FROM documents d JOIN tot t USING (source) WHERE t.t <= 7500
             UNION ALL
             SELECT doc_id, source, n_chars FROM filled
             WHERE cum - n_chars < 7500)
           ORDER BY doc_id""",
      "q_webdataset" ->
        "SELECT doc_id, text FROM documents ORDER BY doc_id",
      "q_webdataset_multi" ->
        "SELECT doc_id, text, lang FROM documents ORDER BY doc_id",
      "q_shard_assign" ->
        """WITH h AS (
             SELECT doc_id,
                    md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS hx
             FROM documents),
           s AS (
             SELECT doc_id, hx,
                    CAST(('0x' || substr(hx, 1, 8))::UBIGINT % 8 AS INT)
                      AS shard
             FROM h)
           SELECT doc_id, shard,
                  row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id)
                    AS shard_pos
           FROM s ORDER BY doc_id""",
      "q_dedup_embedding" ->
        """WITH scored AS (
             SELECT a.vec_id AS "idA", b.vec_id AS "idB",
                    round(
                      list_sum(list_transform(range(1, 65),
                        i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                             * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
                      / (sqrt(list_sum(list_transform(a.embedding,
                           x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                       * sqrt(list_sum(list_transform(b.embedding,
                           x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 4)
                      AS cosine
             FROM embeddings a, embeddings b
             WHERE a.vec_id < b.vec_id AND a.vec_id < 2000 AND b.vec_id < 2000)
           SELECT "idA", "idB", cosine FROM scored
           WHERE cosine >= 0.9 ORDER BY "idA", "idB"""",
      // every duplicated row collapses to one copy (bit-identical,
      // so survivor choice is immaterial)
      "q_stream_dedup" ->
        """SELECT doc_id, text, lang, source, n_chars FROM documents
           ORDER BY doc_id""",
      // the injected corpus-wide header is dropped, unique bodies
      // reassemble verbatim
      "q_boilerplate" ->
        """SELECT doc_id, text FROM documents ORDER BY doc_id""",
      // every injected exact duplicate collapses to its original id;
      // no organic pair reaches cosine 0.9999 (pinned by
      // q_dedup_embedding returning none even at 0.9)
      "q_semdedup" ->
        """SELECT vec_id, label FROM embeddings
           WHERE vec_id < 2000 ORDER BY vec_id""",
      "q_text_stats" ->
        """SELECT doc_id,
                  CAST(len(text) AS INT) AS n_chars_actual,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
                    AS n_tokens,
                  CAST(len(regexp_extract_all(text, '[\p{L}]+|[0-9]+')) AS INT)
                    AS n_subwords,
                  round((len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')))
                        * 1.0 / greatest(len(text), 1), 4) AS punct_ratio,
                  round(least(len(text) / 400.0, 1.0)
                        * (CASE WHEN len(text) * 1.0
                                  / greatest(len(string_split_regex(trim(text), '\s+')), 1)
                                BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END)
                        * (CASE WHEN (len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')))
                                  * 1.0 / greatest(len(text), 1) <= 0.1
                                THEN 1.0 ELSE 0.5 END), 4) AS quality
           FROM documents ORDER BY doc_id""",
      "q_lang_id" ->
        """WITH scored AS (
             SELECT doc_id,
                    len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')),
                        ['the','and','of','to','is','with','for','that'])) AS s_en,
                    len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')),
                        ['der','die','das','und','ist','mit','für','nicht'])) AS s_de,
                    len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')),
                        ['le','la','les','et','est','avec','pour','dans'])) AS s_fr,
                    len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')),
                        ['el','los','las','es','con','para','por','una'])) AS s_es,
                    len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')),
                        ['的','是','了','在','和','有','我','不'])) AS s_zh
             FROM documents)
           SELECT doc_id,
                  CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
                       WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
                       WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                       WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                       ELSE 'zh' END AS lang_pred
           FROM scored ORDER BY doc_id""",
      "q_fingerprint" ->
        s"""SELECT doc_id, md5($normT) AS fp
            FROM documents ORDER BY doc_id""",
      "q_canon_fp" ->
        """SELECT doc_id,
                  md5(trim(regexp_replace(lower(text),
                      '[^a-z0-9]+', ' ', 'g'))) AS canon_fp
           FROM documents ORDER BY doc_id""",
      // Packing rederivation: the distributed two-pass prefix sum
      // must equal the plain global running total.
      "q_pack_sequences" ->
        """WITH t AS (
             SELECT doc_id,
                    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                      AS n_tokens
             FROM documents),
           o AS (
             SELECT doc_id, n_tokens,
                    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS BIGINT) AS tok_offset
             FROM t)
           SELECT doc_id, n_tokens, tok_offset,
                  tok_offset // 512 AS seq_first,
                  (tok_offset + greatest(n_tokens, 1) - 1) // 512 AS seq_last,
                  (tok_offset + greatest(n_tokens, 1) - 1) // 512
                    - tok_offset // 512 + 1 AS n_seqs
           FROM o ORDER BY doc_id""",
      "q_pii_redact" ->
        """WITH t AS (
             SELECT doc_id,
                    text || ' contact user' || doc_id || '@example.com ip 10.'
                         || (doc_id % 256) || '.0.1 tel 555-867-5309' AS dirty
             FROM documents)
           SELECT doc_id,
                  md5(regexp_replace(regexp_replace(regexp_replace(dirty,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g'),
                        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                        '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'))
                    AS red_md5,
                  CAST(len(regexp_extract_all(dirty,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b|\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))
                       AS INT) AS n_pii
           FROM t ORDER BY doc_id""",
      // Winnowing rederivation: positional char 5-grams, 62-bit
      // md5-prefix rolling hashes (>> 2 keeps signed/unsigned min
      // order identical), min per 4-window, distinct + sort.
      "q_fingerprint_winnow" ->
        """WITH d AS (
             SELECT doc_id,
                    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
             FROM documents),
           g AS (
             SELECT doc_id,
                    list_transform(range(1, greatest(len(t) - 4, 1) + 1),
                      i -> substr(t, CAST(i AS INT), 5)) AS cs
             FROM d),
           h AS (
             SELECT doc_id,
                    list_transform(cs,
                      s -> (('0x' || substr(md5(s), 1, 16))::UBIGINT >> 2))
                      AS hs
             FROM g),
           wn AS (
             SELECT doc_id,
                    list_sort(list_distinct(list_transform(
                      range(1, greatest(len(hs) - 3, 1) + 1),
                      j -> list_min(list_slice(hs, CAST(j AS INT),
                                               CAST(j AS INT) + 3))))) AS fps
             FROM h)
           SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp
           FROM wn ORDER BY doc_id, fp""",
      "q_percentiles" ->
        """SELECT l_returnflag,
                  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
                  round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty,
                  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
      "q_embed_norm" ->
        """SELECT vec_id,
                  round(sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 3) AS norm
           FROM embeddings ORDER BY vec_id""",
      // per-dimension mean over each group's vectors. The sum runs in
      // DECIMAL(30,15) on BOTH engines: the decimal cast is a
      // deterministic per-value rounding and decimal addition is
      // exact and associative, so neither engine's aggregation order
      // can shift the mean (double summation order cost r19 its
      // q_embed_pool hash match). Final rounding is the portable
      // floor(x*1e4 + 0.5)/1e4 on both sides: DuckDB's round(v, 4)
      // returns -0.0 for means in (-5e-5, 0) where Spark returns
      // +0.0 — equal as doubles (so a value compare passes) but not
      // as text (so a hash compare fails); the floor form cannot
      // produce -0.0 in either engine.
      "q_embed_pool" ->
        """WITH e AS (
             SELECT vec_id % 50 AS group_id,
                    unnest(embedding) AS v,
                    unnest(range(len(embedding))) AS d
             FROM embeddings)
           SELECT group_id, CAST(d AS INT) AS dim,
                  floor((CAST(sum(CAST(CAST(v AS DOUBLE)
                            AS DECIMAL(30,15))) AS DOUBLE)
                         / count(*)) * 10000 + 0.5) / 10000 AS val
           FROM e GROUP BY group_id, d ORDER BY group_id, dim""",
      "q_ann_brute" ->
        """WITH scored AS (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    list_sum(list_transform(range(1, 65),
                      i -> CAST(q.embedding[CAST(i AS INT)] AS DOUBLE)
                           * CAST(c.embedding[CAST(i AS INT)] AS DOUBLE)))
                    / (sqrt(list_sum(list_transform(q.embedding,
                         x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                     * sqrt(list_sum(list_transform(c.embedding,
                         x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
                      AS cosine
             FROM embeddings q, embeddings c
             WHERE q.vec_id < 10 AND c.vec_id != q.vec_id),
           ranked AS (
             SELECT query_id, neighbor_id, cosine,
                    CAST(row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
             FROM scored)
           SELECT query_id, neighbor_id, round(cosine, 4) AS cosine, rank
           FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
      "q_multimodal" ->
        """SELECT doc_id,
                  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                  round(list_sum(list_transform(range(1, len(text)+1),
                          i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS DOUBLE)))
                        / octet_length(encode(text)), 4) AS mean_byte,
                  CAST(list_max(list_transform(range(1, len(text)+1),
                          i -> ord(substr(text, CAST(i AS INT), 1)))) AS INT)
                    AS max_byte,
                  lower(hex(encode(substr(text, 1, 8)))) AS head_hex
           FROM documents ORDER BY doc_id""",
      // DuckDB cannot substring a BLOB, so the byte slicing rederives
      // on the hex encoding (2 chars per byte: frame = 64 hex chars).
      "q_multimodal_frames" ->
        """WITH b AS (
             SELECT doc_id, lower(hex(encode(text))) AS hx FROM documents),
           f AS (
             SELECT doc_id, hx,
                    unnest(range(0,
                      CAST(ceil(len(hx) / 64.0) AS BIGINT), 4)) AS fi
             FROM b)
           SELECT doc_id, CAST(fi AS INT) AS frame_idx,
                  CAST(len(substr(hx, CAST(fi*64+1 AS BIGINT), 64)) / 2
                    AS INT) AS frame_bytes,
                  substr(hx, CAST(fi*64+1 AS BIGINT), 8) AS head_hex
           FROM f ORDER BY doc_id, frame_idx"""
    )
  }
}
