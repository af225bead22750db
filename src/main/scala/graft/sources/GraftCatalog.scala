package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{DataFrame, GraftRelations, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write,
  Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{GraftFs, Sidecar}
import graft.operators.Maintenance

/** V2 `TableCatalog` for graft tables — NAME-based access to the
  * engine's sidecar datasets through plain Spark SQL:
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = s3://bucket/warehouse
  *
  *   CREATE NAMESPACE graft.db
  *   CREATE TABLE graft.db.events (k BIGINT, v STRING) USING graft
  *     TBLPROPERTIES ('index' = 'k')          -- or PARTITIONED BY (k)
  *   INSERT INTO graft.db.events SELECT ...   -- the sink's one-shuffle
  *                                            -- append, O(delta) stats
  *   SELECT * FROM graft.db.events WHERE k > 5  -- sidecar file pruning
  *   SELECT * FROM graft.db.events VERSION AS OF 3      -- time travel
  *   SELECT * FROM graft.db.events TIMESTAMP AS OF '...'
  *   ALTER TABLE graft.db.events ADD COLUMNS (w DOUBLE) -- metadata-only
  * }}}
  *
  * Identifier → path is a pure warehouse-directory mapping
  * (`<warehouse>/<namespace...>/<name>`), so every path-based tool —
  * the engine API, `format("graft")`, the statement DDL — addresses
  * the SAME table; the catalog adds name resolution and Spark's
  * native `VERSION AS OF` / `TIMESTAMP AS OF` SQL, resolved through
  * the retained-generation ledger ([[Maintenance.versionMeta]] /
  * [[Maintenance.metaAsOf]]).
  *
  * Reads plan through Spark's vectorized DSv2 parquet scan over the
  * sidecar-served file index (zero listings, zero footer reads,
  * pushed filters prune whole files). Writes go through the V1
  * fallback (`V1Write`) onto the graft sink's append/overwrite path —
  * one shuffle, delta-only stats, OCC self-healing — so INSERT INTO
  * at 100 TB has exactly the same cost shape as the path API.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(
      name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    // Optional: without it, NAME-based tables map under the session
    // warehouse (`spark.sql.warehouse.dir`/<catalog>), and path
    // identifiers (`cat.`/abs/path``) need no warehouse at all — so
    // `spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog]
    // .getName)` alone is a working Delta-style setup.
    warehouse = options.get("warehouse") // may be null; resolved lazily
  }

  private def warehouseDir: String =
    Option(warehouse).getOrElse {
      val base = spark.conf.get("spark.sql.warehouse.dir")
      s"${base.stripSuffix("/")}/$catalogName"
    }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  /** Delta-style path identifiers: `cat.`/abs/path`` (a one-part
    * identifier whose name is an absolute path or a URI) addresses
    * the dataset AT that path directly, bypassing the warehouse
    * mapping — so `SELECT * FROM graft.`/data/events``, `UPDATE` /
    * `DELETE FROM` / `MERGE INTO` by path, and time travel all work
    * on tables that were never registered under the warehouse. */
  private def isPathIdent(ident: Identifier): Boolean =
    ident.namespace().isEmpty &&
      (ident.name().startsWith("/") || ident.name().contains("://"))

  private def pathOf(ident: Identifier): String =
    if (isPathIdent(ident)) ident.name()
    else (warehouseDir +: ident.namespace().toSeq :+ ident.name())
      .mkString("/")

  /** The warehouse directory a (namespace, name) identifier maps to —
    * lets the statement DDL ([[graft.plans.GraftSqlParser]]) accept
    * catalog names alongside paths. */
  def tablePath(namespace: Seq[String], name: String): String =
    pathOf(Identifier.of(namespace.toArray, name))

  private def pathOf(namespace: Seq[String]): String =
    (warehouseDir +: namespace).mkString("/")

  // ---- tables ----

  override def tableExists(ident: Identifier): Boolean =
    Sidecar.exists(spark, pathOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val p = pathOf(ident)
    if (!Sidecar.exists(spark, p)) throw new NoSuchTableException(ident)
    new GraftTable(p, fullName(ident), Sidecar.load(spark, p),
      snapshot = false)
  }

  /** `VERSION AS OF n` — the archived generation, read-only. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = pathOf(ident)
    if (!Sidecar.exists(spark, p)) throw new NoSuchTableException(ident)
    new GraftTable(p, s"${fullName(ident)}@v$version",
      Maintenance.versionMeta(spark, p, version.toInt), snapshot = true)
  }

  /** `TIMESTAMP AS OF t` — `timestamp` arrives in MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = pathOf(ident)
    if (!Sidecar.exists(spark, p)) throw new NoSuchTableException(ident)
    new GraftTable(p, s"${fullName(ident)}@ts$timestamp",
      Maintenance.metaAsOf(spark, p, timestamp / 1000L), snapshot = true)
  }

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace().toSeq :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = pathOf(namespace.toSeq)
    val (fs, p) = GraftFs.resolve(spark, dir)
    if (!GraftFs.isDir(fs, p))
      throw new NoSuchNamespaceException(namespace)
    GraftFs.listStatuses(fs, p)
      .filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith(".") && // in-flight staged dirs
        Sidecar.exists(spark, st.getPath.toString))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val p = pathOf(ident)
    if (Sidecar.exists(spark, p))
      throw new TableAlreadyExistsException(ident)
    initTableAt(p, ident, schema, partitions, properties)
    new GraftTable(p, fullName(ident), Sidecar.load(spark, p),
      snapshot = false)
  }

  /** Validate properties/transforms and write the empty sidecar at
    * `p` — shared by [[createTable]] and the staged (atomic CTAS /
    * REPLACE TABLE) path, which initializes a SIBLING directory and
    * renames it in at commit. */
  private def initTableAt(
      p: String,
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Unit = {
    // Index columns: TBLPROPERTIES('index'='c1,c2') / OPTIONS, or the
    // PARTITIONED BY (c1, c2) clause (identity transforms name the
    // range-clustering columns — graft has no hive-style partition
    // dirs, clustering IS its partitioning).
    val props = properties.asScala
    // Identifier→path is a PURE warehouse mapping: a user-supplied
    // LOCATION (or EXTERNAL) cannot be honored, and silently dropping
    // it would land the data somewhere other than the declared path —
    // refuse loudly. Unknown TBLPROPERTIES are refused too (there is
    // no property store to persist them into); Spark's own
    // bookkeeping props (provider/owner/comment) pass through.
    val knownProps = Set("index", "graft.retain",
      TableCatalog.PROP_PROVIDER,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_COMMENT,
      TableCatalog.PROP_TABLE_TYPE)
    // Spark duplicates each OPTIONS entry into properties both bare
    // and `option.`-prefixed — a bare key with a prefixed sibling is
    // an option, not an unknown table property.
    val optionKeys = props.keys.collect {
      case k if k.startsWith(TableCatalog.OPTION_PREFIX) =>
        k.stripPrefix(TableCatalog.OPTION_PREFIX)
    }.toSet
    props.keys.foreach { k =>
      if (k == TableCatalog.PROP_LOCATION ||
          k == TableCatalog.PROP_EXTERNAL ||
          k == TableCatalog.PROP_IS_MANAGED_LOCATION)
        throw new UnsupportedOperationException(
          s"graft tables live at <warehouse>/<namespace>/<name> by " +
            s"construction; CREATE TABLE ... LOCATION/EXTERNAL is not " +
            s"supported (got $k for ${ident.name()}) — point the " +
            "catalog's warehouse at the right root, or use the " +
            "path-based API")
      else if (!knownProps.contains(k) &&
          !k.startsWith(TableCatalog.OPTION_PREFIX) &&
          !optionKeys.contains(k))
        throw new UnsupportedOperationException(
          s"unsupported table property '$k' for graft table " +
            s"${ident.name()} (supported: 'index'; graft tables have " +
            "no property store)")
    }
    // OPTIONS (...) are the sink's write options, declared once at
    // CREATE TABLE: validated here (fail fast, not at first insert),
    // persisted in the sidecar, and forwarded into every catalog
    // write — never silently dropped. Anything the sink wouldn't
    // honor refuses loudly.
    val tableOptions: Map[String, String] = props.toMap.collect {
      case (k, v) if k.startsWith(TableCatalog.OPTION_PREFIX) &&
          k.stripPrefix(TableCatalog.OPTION_PREFIX) != "index" =>
        k.stripPrefix(TableCatalog.OPTION_PREFIX) -> v
    } ++ props.toMap.get("graft.retain").map { v =>
      // TBLPROPERTIES('graft.retain'='true'): this table's row-level
      // SQL ops always archive the outgoing generation, so change
      // streams never depend on each writer's session conf
      require(v.trim.equalsIgnoreCase("true") ||
        v.trim.equalsIgnoreCase("false"),
        s"graft.retain must be true or false, got '$v'")
      "retain" -> v.trim.toLowerCase
    }
    tableOptions.keys.foreach { k =>
      val known = Set("bloom", "stats", "autocompact", "files",
        "retain")
      if (!known.contains(k.toLowerCase) &&
          !(k.toLowerCase.startsWith("constraint.") &&
            k.length > "constraint.".length))
        throw new UnsupportedOperationException(
          s"unsupported OPTION '$k' for graft table ${ident.name()} " +
            "(supported: index, bloom, stats, autoCompact, files, " +
            "constraint.<name>)")
    }
    def optCols(name: String): Seq[String] = tableOptions
      .collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    optCols("bloom").foreach { c =>
      require(schema.fieldNames.contains(c),
        s"OPTION bloom: no such column $c")
      require(graft.core.BloomIndex.supported(schema(c).dataType),
        "OPTION bloom: supports integral and string columns; " +
          s"$c is ${schema(c).dataType.simpleString}")
    }
    optCols("stats").foreach { c =>
      require(schema.fieldNames.contains(c),
        s"OPTION stats: no such column $c")
      require(graft.core.ColumnStats.supported(schema(c).dataType),
        "OPTION stats: supports numeric, string, date and timestamp " +
          s"columns; $c is ${schema(c).dataType.simpleString}")
    }
    val fromProps = (props.get("index").toSeq ++
      props.get(TableCatalog.OPTION_PREFIX + "index").toSeq)
      .headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // Transforms map onto the engine's ONE physical layout — range
    // clustering by lex key: `identity(c)` clusters on c;
    // `years/months/days/hours(ts)` cluster on ts itself, which
    // DOMINATES the truncation (any `days(ts)` range is a ts range,
    // and finer predicates prune further — hive-style truncated
    // partition dirs would only coarsen the file bounds);
    // `bucket(n, c)` clusters on c — range clustering is this
    // engine's co-location (the shuffle-free division join aligns on
    // range bounds, not hashes), point lookups prune by the same
    // per-file bounds hash buckets would, and the declared width n is
    // advisory (file sizing is the writer's `files` option /
    // compaction target).
    val fromPartitions = partitions.toSeq.map { t =>
      t.name match {
        case "identity" | "years" | "months" | "days" | "hours" |
            "bucket" =>
          t.references().head.fieldNames.mkString(".")
        case other => throw new UnsupportedOperationException(
          s"unsupported partition transform $other(...) for graft " +
            s"table ${ident.name()} (supported: identity, " +
            "years/months/days/hours, bucket)")
      }
    }.distinct match { case Nil => None; case cols => Some(cols) }
    val index = fromProps.orElse(fromPartitions).getOrElse(
      throw new IllegalArgumentException(
        "a graft table needs its clustering columns: declare " +
          "PARTITIONED BY (c1, c2) or TBLPROPERTIES('index'='c1,c2')"))
    index.foreach(c => require(schema.fieldNames.contains(c),
      s"index column $c is not in the table schema"))
    val (fs, dirPath) = GraftFs.resolve(spark, p)
    GraftFs.mkdirs(fs, dirPath)
    Sidecar.write(spark, p, index, Seq.empty, Seq.empty, Seq.empty,
      Seq.empty, maxPartitionIndex = -1L, schema,
      extras = if (tableOptions.isEmpty) Map.empty
        else Map("tableOptions" -> tableOptions))
    // CHECK constraints declared at CREATE TABLE install immediately
    // (the table is empty — trivially valid), so the very first
    // insert is already guarded up front.
    tableOptions.toSeq.sortBy(_._1).foreach { case (k, v) =>
      if (k.toLowerCase.startsWith("constraint."))
        graft.operators.Constraints.add(spark, p,
          k.substring("constraint.".length), v)
    }
  }

  // ---- staged (atomic) CTAS / REPLACE TABLE ----
  //
  // `CREATE OR REPLACE TABLE ... AS SELECT` and `REPLACE TABLE`
  // require a StagingTableCatalog: the query writes into a HIDDEN
  // sibling directory (`.staging-<name>-<uuid>`, invisible to
  // listTables), and only commitStagedChanges installs it at the
  // table path — a failed query never leaves a half-replaced table,
  // and the replaced content is moved aside before the install so no
  // window exists where the path holds partial data.

  private def stagedPathFor(ident: Identifier): String = {
    val p = pathOf(ident)
    val cut = p.lastIndexOf('/')
    p.take(cut + 1) +
      s".staging-${p.drop(cut + 1)}-${java.util.UUID.randomUUID()}"
  }

  private def stage(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String],
      replace: Boolean,
      orCreate: Boolean): StagedTable = {
    val finalPath = pathOf(ident)
    if (!replace && Sidecar.exists(spark, finalPath))
      throw new TableAlreadyExistsException(ident)
    if (replace && !orCreate && !Sidecar.exists(spark, finalPath))
      throw new NoSuchTableException(ident)
    val staged = stagedPathFor(ident)
    initTableAt(staged, ident, schema, partitions, properties)
    new GraftStagedTable(spark, staged, finalPath,
      new GraftTable(staged, fullName(ident),
        Sidecar.load(spark, staged), snapshot = false),
      replace = replace)
  }

  override def stageCreate(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, schema, partitions, properties,
      replace = false, orCreate = false)

  override def stageReplace(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, schema, partitions, properties,
      replace = true, orCreate = false)

  override def stageCreateOrReplace(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, schema, partitions, properties,
      replace = true, orCreate = true)

  override def alterTable(
      ident: Identifier, changes: TableChange*): Table = {
    val p = pathOf(ident)
    if (!Sidecar.exists(spark, p)) throw new NoSuchTableException(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          "graft tables have no nested columns to add into")
        Maintenance.addColumns(spark, p,
          org.apache.spark.sql.types.StructField(
            add.fieldNames.head, add.dataType, nullable = true))
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          "graft tables have no nested columns to drop from")
        Maintenance.dropColumns(spark, p, del.fieldNames.head)
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames.length == 1,
          "graft tables have no nested columns to rename")
        Maintenance.renameColumns(spark, p,
          rn.fieldNames.head -> rn.newName)
      case ut: TableChange.UpdateColumnType =>
        // metadata-only for safe widenings (Maintenance.widenColumns
        // refuses narrowings loudly); also reached by MERGE WITH
        // SCHEMA EVOLUTION when the source carries a wider type
        require(ut.fieldNames.length == 1,
          "graft tables have no nested columns to alter")
        Maintenance.widenColumns(spark, p,
          ut.fieldNames.head -> ut.newDataType)
      case other =>
        throw new UnsupportedOperationException(
          s"ALTER TABLE change ${other.getClass.getSimpleName} is not " +
            "supported on graft tables (supported: ADD COLUMNS, " +
            "DROP COLUMN, RENAME COLUMN, ALTER COLUMN TYPE widening)")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = pathOf(ident)
    if (!Sidecar.exists(spark, p)) false
    else {
      // A dropped CLONE deregisters its source-side backlinks first,
      // so the owners' replaced files free immediately instead of
      // waiting out the stale-marker grace. No-op for non-clones.
      graft.operators.Maintenance.deregisterCloneBacklinks(spark, p)
      val (fs, dirPath) = GraftFs.resolve(spark, p)
      GraftFs.deleteRecursive(fs, dirPath)
      true
    }
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val (fs, src) = GraftFs.resolve(spark, pathOf(from))
    if (!Sidecar.exists(spark, pathOf(from)))
      throw new NoSuchTableException(from)
    if (Sidecar.exists(spark, pathOf(to)))
      throw new TableAlreadyExistsException(to)
    val (_, dst) = GraftFs.resolve(spark, pathOf(to))
    GraftFs.mkdirs(fs, dst.getParent)
    if (!fs.rename(src, dst)) throw new java.io.IOException(
      s"rename $src -> $dst failed")
  }

  // ---- namespaces (plain warehouse subdirectories) ----

  override def listNamespaces(): Array[Array[String]] = {
    val (fs, p) = GraftFs.resolve(spark, warehouseDir)
    if (!GraftFs.isDir(fs, p)) Array.empty
    else GraftFs.listStatuses(fs, p)
      .filter(st => st.isDirectory &&
        !Sidecar.exists(spark, st.getPath.toString))
      .map(st => Array(st.getPath.getName))
      .toArray
  }

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val (fs, p) = GraftFs.resolve(spark, pathOf(namespace.toSeq))
      GraftFs.isDir(fs, p)
    }

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) new util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(
      namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val (fs, p) = GraftFs.resolve(spark, pathOf(namespace.toSeq))
    GraftFs.mkdirs(fs, p)
  }

  override def alterNamespace(
      namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces are plain directories and carry no metadata")

  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean = {
    val (fs, p) = GraftFs.resolve(spark, pathOf(namespace.toSeq))
    if (!GraftFs.isDir(fs, p)) false
    else {
      if (!cascade)
        require(GraftFs.listStatuses(fs, p).isEmpty,
          s"namespace ${namespace.mkString(".")} is not empty")
      GraftFs.deleteRecursive(fs, p)
      true
    }
  }
}

object GraftCatalog {
  /** Resolve a catalog-qualified `cat.ns....name` through the active
    * session's registered catalogs: Some(warehouse path) when the
    * named catalog is a [[GraftCatalog]], None otherwise (including
    * parse/lookup failures) — shared by the statement DDL and the
    * streaming source/sink's `option("table", ...)`. */
  def resolveName(name: String): Option[String] = {
    val parts = name.split("\\.").toSeq
    if (parts.length < 2 || parts.exists(_.isEmpty)) return None
    try {
      val spark = org.apache.spark.sql.classic.SparkSession.active
      spark.sessionState.catalogManager.catalog(parts.head) match {
        case g: GraftCatalog =>
          Some(g.tablePath(parts.tail.dropRight(1), parts.last))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}

/** One graft table (or one archived generation of it) through the V2
  * `Table` interface: vectorized DSv2 parquet reads over the
  * sidecar-served listing, V1-fallback writes through the graft
  * sink. Snapshot tables (VERSION/TIMESTAMP AS OF) are read-only. */
final class GraftTable(
    val path: String,
    tableName: String,
    val meta: Sidecar.Meta,
    val snapshot: Boolean)
    extends Table with SupportsRead with SupportsWrite
    with SupportsDeleteV2 with org.apache.spark.sql.GraftV1FallbackTable {

  /** `writeStream.toTable("cat.db.t")` / `readStream.table(...)`:
    * Spark's streaming writer takes the V1-fallback route for tables
    * that expose one — this synthetic descriptor points it at the
    * graft V1 source, so toTable lands on the SAME transactional
    * streaming sink (`txnAppId`/`txnVersion` ledger, exactly-once
    * batch replay) as `.start(dir)` / `option("table", ...)`. */
  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    require(!snapshot,
      s"$tableName is a read-only snapshot (VERSION/TIMESTAMP AS OF); " +
        "stream to/from the current table instead")
    catalogDescriptor
  }

  /** The same descriptor without the snapshot guard — the analysis
    * splice stamps it onto spliced V1 relations so name-based cache
    * invalidation (`Catalog.refreshTable` does `catalogTable.get` on
    * every LogicalRelation it finds, e.g. after every streaming
    * toTable batch) has an identifier to invalidate by. */
  private[graft] def catalogDescriptor:
      org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat,
      CatalogTable, CatalogTableType, CatalogUtils}
    // A path identifier (`cat.`/data/events.v2``) must NOT be split
    // on dots — the path IS the identity; only warehouse-mapped
    // names carry catalog/namespace parts.
    val ident =
      if (tableName.contains("/"))
        org.apache.spark.sql.catalyst.TableIdentifier(tableName)
      else {
        val parts = tableName.split("\\.")
        org.apache.spark.sql.catalyst.TableIdentifier(
          parts.last,
          if (parts.length >= 2) Some(parts(parts.length - 2)) else None,
          parts.headOption.filter(_ => parts.length >= 3))
      }
    CatalogTable(
      identifier = ident,
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(CatalogUtils.stringToURI(path)),
        properties = Map("index" -> meta.indexColumns.mkString(","))),
      schema = meta.schema,
      provider = Some("graft"))
  }

  import org.apache.spark.sql.connector.expressions.filter.Predicate

  /** The conjunction of translatable V2 predicates as a Column; None
    * when any predicate has no strict translation (decline the
    * delete rather than drop the wrong rows). An EMPTY predicate
    * array is DELETE-everything (`lit(true)`). */
  private def translate(
      predicates: Array[Predicate]): Option[org.apache.spark.sql.Column] = {
    val v1 = predicates.toSeq.map(
      org.apache.spark.sql.GraftBridge.predicateToV1Filter)
    if (v1.exists(_.isEmpty)) None
    else {
      val cols = v1.flatten.map(GraftSource.translateFilter)
      if (cols.exists(_.isEmpty)) None
      else cols.flatten.reduceOption(_ && _)
        .orElse(Some(org.apache.spark.sql.functions.lit(true)))
    }
  }

  /** `DELETE FROM graft.db.t WHERE p` — served MERGE-ON-READ: the
    * matching row positions are marked in the KB-scale deletion-
    * vector overlay ([[graft.operators.DeletionVectors.deleteWhere]]),
    * zero data files rewritten at any table size; reads apply the
    * vectors transparently and `materialize` folds them in by
    * rewriting only the marked files. */
  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    !snapshot && translate(predicates).isDefined

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    require(!snapshot,
      s"$tableName is a read-only snapshot; DELETE from the current table")
    val cond = translate(predicates).getOrElse(
      throw new UnsupportedOperationException(
        s"DELETE predicate has no exact pushdown translation for " +
          s"$tableName: ${predicates.mkString(", ")}"))
    graft.operators.DeletionVectors.deleteWhere(
      SparkSession.active, path, cond)
  }

  /** `TRUNCATE TABLE graft.db.t` — metadata-only
    * ([[Maintenance.truncate]]): schema, clustering and the txn
    * ledger survive; zero data I/O at any table size. */
  override def truncateTable(): Boolean = {
    require(!snapshot,
      s"$tableName is a read-only snapshot; TRUNCATE the current table")
    Maintenance.truncate(SparkSession.active, path)
    true
  }

  override def name(): String = tableName
  override def schema(): StructType = meta.schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      // MERGE ... WITH SCHEMA EVOLUTION: the analyzer widens the
      // table through alterTable (AddColumn -> metadata-only
      // Maintenance.addColumns) before resolving the clauses
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put(TableCatalog.PROP_LOCATION, path)
    m.put(TableCatalog.PROP_PROVIDER, "graft")
    m.put("index", meta.indexColumns.mkString(","))
    m
  }

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = SparkSession.active
    // Two table states the RAW V2 parquet scan cannot serve: pending
    // deletion vectors (it would resurrect deleted rows) and
    // metadata-only renamed columns (it reads by on-disk name).
    // Extension sessions splice catalog READS to the DV-merging /
    // rename-aware V1 relation before any scan builds, and write /
    // row-level commands (DELETE, UPDATE, MERGE) instantiate a scan
    // builder on their target during pushdown without ever running
    // it — so refuse LAZILY, at the point the scan would execute,
    // never during planning. (Snapshot reads address committed
    // generations, which vectors never cover — they stay readable.)
    val refusal: Option[String] =
      if (!snapshot &&
          graft.operators.DeletionVectors.exists(spark, path))
        Some(s"table $tableName has pending deletion vectors; " +
          "materialize them (DeletionVectors.apply), use a session " +
          "with graft.GraftExtensions, or read through " +
          "spark.read.format(\"graft\") — both merge on read")
      else if (meta.columnRenames.nonEmpty)
        Some(s"table $tableName has metadata-only renamed columns; " +
          "read it in a session with graft.GraftExtensions (which " +
          "serves catalog reads through the rename-aware relation) " +
          "or through spark.read.format(\"graft\")")
      else None
    refusal match {
      case None => GraftRelations.v2ScanBuilder(spark, path, meta, options)
      case Some(msg) =>
        val logical = meta.schema
        new ScanBuilder {
          override def build(): org.apache.spark.sql.connector.read.Scan =
            new org.apache.spark.sql.connector.read.Scan {
              override def readSchema(): StructType = logical
              override def description(): String =
                s"graft V1-only scan for $tableName"
              override def toBatch
                  : org.apache.spark.sql.connector.read.Batch =
                throw new IllegalStateException(msg)
            }
        }
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(!snapshot,
      s"$tableName is a read-only snapshot (VERSION/TIMESTAMP AS OF); " +
        "write to the current table instead")
    new GraftWriteBuilder(path, meta.indexColumns.toSeq,
      meta.tableOptions)
  }

  override def toString: String = s"GraftTable($tableName)"
}

/** Extension-session unification of catalog reads with the V1 graft
  * relation: a [[GraftTable]]'s `DataSourceV2Relation` is spliced
  * out during analysis for the V1 `LogicalRelation` over the same
  * metadata generation — so name-based SQL gains everything the
  * path-based read has: the metadata-only aggregate folds
  * ([[graft.plans.MetadataCount]]), the conf-driven view rewrites,
  * and merge-on-read over pending deletion vectors (which the raw
  * V2 scan refuses). Write-command targets are left alone (the V2
  * write path owns them); sessions without
  * [[graft.GraftExtensions]] keep the plain V2 vectorized scan. */
final class GraftV2ScanSubstitution(session: SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable,
    InsertIntoStatement, LogicalPlan, MergeIntoTable, Project,
    UpdateTable, V2WriteCommand}
  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Write and row-level commands own their target relation — the V2
    // planner must see the DataSourceV2Relation there (DELETE FROM
    // routes through SupportsDeleteV2, INSERT through the V1Write
    // fallback); only pure READ occurrences splice.
    val writeTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def mark(target: LogicalPlan): Unit = target.foreach {
      case r: DataSourceV2Relation => writeTargets.add(r); ()
      case _ => ()
    }
    plan.foreach {
      case w: V2WriteCommand => mark(w.table)
      case d: DeleteFromTable => mark(d.table)
      case u: UpdateTable => mark(u.table)
      case mi: MergeIntoTable => mark(mi.targetTable)
      // An INSERT whose query side needs >1 resolution iteration is
      // still an InsertIntoStatement when this rule fires (Spark's
      // ResolveInsertInto converts it to AppendData only once the
      // query resolves) — splicing its target mid-flight would break
      // the later conversion, so the not-yet-converted shape marks
      // its target too.
      case i: InsertIntoStatement => mark(i.table)
      case _ => ()
    }
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] &&
            !writeTargets.contains(r) =>
        val t = r.table.asInstanceOf[GraftTable]
        val native: LogicalPlan =
          if (!t.snapshot &&
              graft.operators.DeletionVectors.exists(session, t.path))
            org.apache.spark.sql.GraftBridge.planOf(
              graft.operators.DeletionVectors.scan(session, t.path))
          else org.apache.spark.sql.execution.datasources.LogicalRelation(
            org.apache.spark.sql.GraftRelations.sidecarRelationFor(
              session, t.path, t.meta))
        // Catalog.refreshTable (run e.g. after every streaming
        // toTable batch) calls `catalogTable.get` on each
        // LogicalRelation it walks — stamp the table's descriptor on
        // every spliced relation so name-based invalidation works.
        val desc = t.catalogDescriptor
        val withDesc = native.transform {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation if lr.catalogTable.isEmpty =>
            lr.copy(catalogTable = Some(desc))
        }
        Project(r.output.zip(withDesc.output).map { case (o, a) =>
          Alias(a, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }, withDesc)
    }
  }
}

/** INSERT INTO / INSERT OVERWRITE via the V1 write fallback: the
  * engine's sink already implements the scalable append (one
  * range-partitioned shuffle, stats over only the delta, OCC
  * self-healing install) — `V1Write` hands the V2 planner exactly
  * that path instead of duplicating it. A scoped overwrite
  * (`INSERT INTO t REPLACE WHERE p` / `df.writeTo(t).overwrite(p)`)
  * lands on [[Maintenance.replaceWhere]]: ONE commit that rewrites
  * only the files holding matching rows and refuses incoming rows
  * outside the predicate (the Delta contract). */
private[sources] final class GraftWriteBuilder(
    path: String, index: Seq[String], tableOpts: Map[String, String])
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsOverwrite {

  private var overwriteAll = false
  private var replaceCond: Option[org.apache.spark.sql.Column] = None

  override def truncate(): WriteBuilder = { overwriteAll = true; this }

  override def overwrite(
      filters: Array[org.apache.spark.sql.sources.Filter]):
      WriteBuilder = {
    if (filters.isEmpty ||
        filters.forall(_ == org.apache.spark.sql.sources.AlwaysTrue))
      overwriteAll = true
    else {
      val cols = filters.toSeq.map(GraftSource.translateFilter)
      if (cols.exists(_.isEmpty))
        throw new UnsupportedOperationException(
          "REPLACE WHERE condition has no exact translation for a " +
            s"graft table: ${filters.mkString(", ")}")
      replaceCond = Some(cols.flatten.reduce(_ && _))
    }
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, over: Boolean): Unit = {
          replaceCond match {
            case Some(cond) =>
              Maintenance.replaceWhere(
                data.sparkSession, path, cond, data,
                retain = graft.plans.GraftRowLevel.sqlRetain(
                  data.sparkSession, path))
            case None =>
              val mode =
                if (overwriteAll || over) SaveMode.Overwrite
                else SaveMode.Append
              val sqlc = data.sparkSession
                .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
                .sqlContext
              // table-level OPTIONS declared at CREATE TABLE ride
              // along on every name-based write (path/index win)
              new GraftSource().createRelation(sqlc, mode,
                tableOpts ++ Map(
                  "path" -> path, "index" -> index.mkString(",")), data)
          }
          ()
        }
      }
  }
}

/** One staged table for atomic CTAS / REPLACE TABLE: the CTAS query
  * writes into a hidden `.staging-*` sibling through the same
  * V1-fallback sink as any graft write; [[commitStagedChanges]]
  * installs it at the table path with renames (replaced content is
  * moved aside FIRST, so the path never holds partial data, and is
  * deleted only after the install succeeds); [[abortStagedChanges]]
  * just deletes the staging directory — a failed or cancelled query
  * leaves the original table untouched. */
private[sources] final class GraftStagedTable(
    spark: SparkSession,
    stagedPath: String,
    finalPath: String,
    inner: GraftTable,
    replace: Boolean)
    extends StagedTable with SupportsRead with SupportsWrite {

  override def name(): String = inner.name()
  override def schema(): StructType = inner.schema()
  override def capabilities(): util.Set[TableCapability] =
    inner.capabilities()
  override def properties(): util.Map[String, String] =
    inner.properties()
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    inner.newScanBuilder(options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    inner.newWriteBuilder(info)

  override def commitStagedChanges(): Unit = {
    val (fs, staged) = GraftFs.resolve(spark, stagedPath)
    val (_, dest) = GraftFs.resolve(spark, finalPath)
    val existing = Sidecar.exists(spark, finalPath)
    if (existing && !replace)
      throw new IllegalStateException(
        s"$finalPath appeared while the CTAS was staging; " +
          "use CREATE OR REPLACE TABLE to overwrite it")
    if (!existing && GraftFs.isDir(fs, dest)) {
      // dest exists as a BARE directory (no sidecar): empty debris is
      // removed (a posix rename onto an existing dir would NEST the
      // staged dir inside it); foreign content refuses — committing
      // over it would adopt or shadow files this CTAS never wrote
      if (GraftFs.listStatuses(fs, dest).isEmpty) fs.delete(dest, true)
      else throw new IllegalStateException(
        s"cannot install staged table at $dest: the directory exists " +
          "with content but no graft sidecar (not a table this commit " +
          "may replace) — clean it or choose another name")
    }
    val trash =
      if (existing) {
        val t = new HPath(Option(dest.getParent).getOrElse(dest),
          s".replaced-${dest.getName}-${java.util.UUID.randomUUID()}")
        if (!fs.rename(dest, t)) throw new java.io.IOException(
          s"could not move the replaced table $dest aside to $t")
        Some(t)
      } else None
    GraftStagedTable.betweenRenames()
    if (!fs.rename(staged, dest)) {
      // put the old content back before failing — the table must
      // never be lost to a failed install
      trash.foreach(t => fs.rename(t, dest))
      throw new java.io.IOException(
        s"could not install staged table $staged at $dest")
    }
    // A dest that (re)appeared between the checks and the rename
    // SWALLOWS it (Hadoop moves src inside an existing dir and
    // returns true): detect the nesting, withdraw our copy, and
    // surface the conflict instead of reporting a success that
    // installed nothing.
    val nested = new HPath(dest, staged.getName)
    if (GraftFs.isDir(fs, nested)) {
      GraftFs.deleteRecursive(fs, nested)
      // The pre-replace content is NOT deleted on this path — the
      // commit is failing, and the move-aside copy is the only
      // surviving version of the replaced table. If the concurrent
      // winner vanished again (or left only empty debris), restore
      // the replaced table outright; otherwise leave the copy in
      // place and name it so the operator can recover.
      val destFree = !Sidecar.exists(spark, finalPath) &&
        (!GraftFs.isDir(fs, dest) ||
          (GraftFs.listStatuses(fs, dest).isEmpty && fs.delete(dest, true)))
      val restored = destFree && trash.exists(t => fs.rename(t, dest))
      throw new java.util.ConcurrentModificationException(
        s"staged table install at $dest lost a race to a concurrent " +
          "writer (the destination appeared mid-commit); this CTAS " +
          "was rolled back" + (trash match {
            case Some(_) if restored =>
              s" and the replaced table was restored at $dest"
            case Some(t) =>
              s"; the replaced table's content is preserved at $t"
            case None => ""
          }) + " — retry against the current table")
    }
    trash.foreach(GraftFs.deleteRecursive(fs, _))
  }

  override def abortStagedChanges(): Unit = {
    val (fs, staged) = GraftFs.resolve(spark, stagedPath)
    GraftFs.deleteRecursive(fs, staged)
  }

  override def toString: String = s"GraftStagedTable(${inner.name()})"
}

private[graft] object GraftStagedTable {
  /** Test seam: runs between the move-aside rename and the install
    * rename — the window where a concurrent writer can recreate the
    * destination (the lost-race rollback GraftCatalogSpec pins).
    * No-op in production. */
  private[graft] var betweenRenames: () => Unit = () => ()
}
