package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.operators.{Constraints, Maintenance}

/** Statement-level SQL DDL for graft tables (injected by
  * [[graft.GraftExtensions]] via `injectParser`) — meets SQL users
  * where they are, on top of the options-DDL the source already
  * carries (`option("constraint.<n>", ...)`, `option("history",
  * true)`, ...). Tables are addressed by path, Delta-style:
  * `graft.`/data/events`` or a plain `'/data/events'` string.
  *
  *   ALTER TABLE graft.`/p` ADD CONSTRAINT positive CHECK (qty > 0)
  *   ALTER TABLE graft.`/p` DROP CONSTRAINT [IF EXISTS] positive
  *   SHOW CONSTRAINTS [ON] graft.`/p`
  *   DESCRIBE HISTORY graft.`/p`
  *   DESCRIBE DETAIL graft.`/p`
  *   VACUUM graft.`/p` RETAIN LAST 3
  *   VACUUM graft.`/p` OLDER THAN INTERVAL 7 DAYS   -- or '<timestamp>'
  *   RESTORE [TABLE] graft.`/p` TO VERSION AS OF 2
  *   RESTORE [TABLE] graft.`/p` TO TIMESTAMP AS OF '2026-08-01'
  *   OPTIMIZE graft.`/p` [WHERE k BETWEEN 10 AND 20] TARGET 1000000 ROWS
  *   OPTIMIZE graft.`/p` ZORDER BY (a, b) [TARGET 8 FILES] [INTO '/q']
  *   OPTIMIZE graft.`/p` RECLUSTER [RETAIN]
  *   CREATE TABLE graft.`/q` SHALLOW CLONE graft.`/p`
  *     [VERSION AS OF 2 | TIMESTAMP AS OF '<ts>']
  *   ANALYZE TABLE graft.`/p` COMPUTE STATISTICS FOR COLUMNS (a, b)
  *   ANALYZE TABLE graft.`/p` COMPUTE BLOOM [FPP 0.01] FOR COLUMNS (a)
  *
  * Every statement maps onto the corresponding engine op
  * ([[Constraints]] / [[Maintenance]]) — semantics, validation scans
  * and O(metadata) costs are exactly the programmatic API's. Any
  * other statement delegates untouched to Spark's parser.
  */
final class GraftSqlParser(delegate: ParserInterface)
    extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseGraft(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    parseGraft(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  // graft.`/path` (Delta-style), a bare '/path' string literal, or a
  // catalog-qualified NAME (cat.db.t) resolved through a registered
  // graft.sources.GraftCatalog — a name whose catalog is NOT a graft
  // catalog makes the whole statement fall through to the delegate
  // parser, so these statements never shadow other formats' DDL.
  private val T = """(?:graft\s*\.\s*`([^`]+)`|'([^']+)'|([\w.]+))"""
  private def path(a: String, b: String, c: String): String =
    tbl(a, b, c).getOrElse(
      throw new IllegalArgumentException(s"'$c' does not resolve"))
  private def tbl(a: String, b: String, c: String): Option[String] =
    Option(a).orElse(Option(b)).orElse(Option(c).flatMap(resolveNamed))
  private def resolveNamed(name: String): Option[String] =
    graft.sources.GraftCatalog.resolveName(name)

  private val AddConstraint =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+ADD\s+CONSTRAINT\s+([\w\-]+)\s+CHECK\s*\((.*)\)\s*;?\s*""").r
  private val DropConstraint =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+DROP\s+CONSTRAINT\s+(?:IF\s+EXISTS\s+)?([\w\-]+)\s*;?\s*""").r
  private val ShowConstraints =
    ("""(?is)\s*SHOW\s+CONSTRAINTS\s+(?:ON\s+|FOR\s+)?""" + T +
      """\s*;?\s*""").r
  private val DescHistory =
    ("""(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+""" + T + """\s*;?\s*""").r
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+""" + T +
      """(?:\s+RETAIN\s+LAST\s+(\d+))?""" +
      """(?:\s+OLDER\s+THAN\s+(?:'([^']+)'""" +
      """|(?:INTERVAL\s+)?(\d+)\s+(HOURS?|DAYS?|MINUTES?)))?""" +
      """(?:\s+(DRY\s+RUN))?\s*;?\s*""").r
  private val Restore =
    ("""(?is)\s*RESTORE\s+(?:TABLE\s+)?""" + T +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  private val RestoreTs =
    ("""(?is)\s*RESTORE\s+(?:TABLE\s+)?""" + T +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""").r
  private val Optimize =
    ("""(?is)\s*OPTIMIZE\s+""" + T +
      """(?:\s+WHERE\s+(.+?))?""" +
      """\s+TARGET\s+(\d+)\s+ROWS\s*;?\s*""").r
  private val ZOrder =
    ("""(?is)\s*OPTIMIZE\s+""" + T +
      """\s+ZORDER\s+BY\s*\(([^)]*)\)""" +
      """(?:\s+TARGET\s+(\d+)\s+FILES)?""" +
      """(?:\s+INTO\s+""" + T + """)?\s*;?\s*""").r
  private val Recluster =
    ("""(?is)\s*OPTIMIZE\s+""" + T +
      """\s+RECLUSTER(?:\s+(RETAIN))?\s*;?\s*""").r
  private val DescDetail =
    ("""(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+""" + T + """\s*;?\s*""").r
  private val ConvertTo =
    ("""(?is)\s*CONVERT\s+TO\s+GRAFT\s+""" + T +
      """\s+INDEX\s*\(([^)]*)\)\s*;?\s*""").r
  private val CopyInto =
    ("""(?is)\s*COPY\s+INTO\s+""" + T +
      """\s+FROM\s+'([^']+)'""" +
      """\s+FILEFORMAT\s*=\s*(\w+)""" +
      """(?:\s+PATTERN\s*=\s*'([^']+)')?""" +
      """(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?""" +
      """(?:\s+(FORCE))?\s*;?\s*""").r
  private val CloneStmt =
    ("""(?is)\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?""" + T +
      """\s+SHALLOW\s+CLONE\s+""" + T +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+)""" +
      """|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?\s*;?\s*""").r
  private val Analyze =
    ("""(?is)\s*ANALYZE\s+TABLE\s+""" + T +
      """\s+COMPUTE\s+(STATISTICS|BLOOM)""" +
      """(?:\s+FPP\s+([0-9.]+))?""" +
      """\s+FOR\s+(?:(ALL)\s+COLUMNS|COLUMNS\s+\(?([\w`,\s]+?)\)?)""" +
      """\s*;?\s*""").r

  private[plans] def parseGraft(sql: String): Option[LogicalPlan] =
    sql match {
      case AddConstraint(a, b, c, name, expr) =>
        tbl(a, b, c).map(GraftAddConstraintCommand(_, name, expr.trim))
      case DropConstraint(a, b, c, name) =>
        tbl(a, b, c).map(GraftDropConstraintCommand(_, name))
      case ShowConstraints(a, b, c) =>
        tbl(a, b, c).map(GraftShowConstraintsCommand(_))
      case DescHistory(a, b, c) =>
        tbl(a, b, c).map(GraftDescribeHistoryCommand(_))
      case DescDetail(a, b, c) =>
        tbl(a, b, c).map(GraftDescribeDetailCommand(_))
      case Vacuum(a, b, c, n, ts, iv, unit, dry) =>
        tbl(a, b, c).map(GraftVacuumCommand(_,
          Option(n).map(_.toInt),
          Option(ts).map(graft.sources.GraftSource.parseTs),
          for { v <- Option(iv); u <- Option(unit) }
            yield intervalMillis(v.toLong, u),
          dryRun = dry != null))
      case Restore(a, b, c, v) =>
        tbl(a, b, c).map(GraftRestoreCommand(_, v.toInt))
      case RestoreTs(a, b, c, ts) =>
        tbl(a, b, c).map(GraftRestoreTimestampCommand(_,
          graft.sources.GraftSource.parseTs(ts)))
      case Optimize(a, b, c, where, rows) =>
        tbl(a, b, c).map(GraftOptimizeCommand(_, rows.toLong,
          Option(where).map(_.trim)))
      case Recluster(a, b, c, retain) =>
        tbl(a, b, c).map(GraftReclusterCommand(_, retain != null))
      case ConvertTo(a, b, c, cols) =>
        val cs = cols.split(",").map(_.trim.stripPrefix("`")
          .stripSuffix("`")).filter(_.nonEmpty).toSeq
        tbl(a, b, c).map(GraftConvertCommand(_, cs))
      case CopyInto(a, b, c, src, fmt, pattern, opts, force) =>
        // FORMAT_OPTIONS('k'='v', ...) — quoted pairs consumed left
        // to right (NOT comma-split: a quoted VALUE may itself hold
        // commas, e.g. 'members'='txt:text,json:meta')
        val parsed = Option(opts).map(_.trim).filter(_.nonEmpty)
          .map { o =>
            val pair = """\s*'([^']*)'\s*=\s*'([^']*)'\s*(?:,|$)""".r
            var idx = 0
            val out = Map.newBuilder[String, String]
            while (idx < o.length) {
              pair.findPrefixMatchOf(o.subSequence(idx, o.length)) match {
                case Some(p) =>
                  out += (p.group(1) -> p.group(2))
                  idx += p.end
                case None => throw new IllegalArgumentException(
                  s"FORMAT_OPTIONS entries are 'key'='value' pairs; " +
                    s"got '${o.substring(idx)}'")
              }
            }
            out.result()
          }.getOrElse(Map.empty[String, String])
        tbl(a, b, c).map(GraftCopyIntoCommand(_, src, fmt,
          Option(pattern).getOrElse("*"), parsed, force != null))
      case Analyze(a, b, c, kind, fpp, all, cols) =>
        val cs =
          if (all != null) Nil // FOR ALL COLUMNS: resolved at run time
          else cols.split(",").map(_.trim.stripPrefix("`")
            .stripSuffix("`")).filter(_.nonEmpty).toSeq
        tbl(a, b, c).map(GraftAnalyzeCommand(_,
          bloom = kind.equalsIgnoreCase("BLOOM"), cs,
          Option(fpp).map(_.toDouble), allColumns = all != null))
      case CloneStmt(ine, a, b, c, a2, b2, c2, v, ts) =>
        // HALF-resolved pairs refuse with the failing identifier
        // named — falling through to Spark's parser (which has no
        // SHALLOW CLONE syntax) would surface an unrelated syntax
        // error. A pair where NEITHER ident touches graft still
        // delegates: another extension's parser may own the statement
        // (e.g. a co-installed lakehouse format's own CLONE).
        (tbl(a, b, c), tbl(a2, b2, c2)) match {
          case (Some(dst), Some(src)) =>
            Some(GraftCloneCommand(dst, src,
              Option(v).map(_.toInt),
              Option(ts).map(graft.sources.GraftSource.parseTs),
              ifNotExists = ine != null))
          case (None, None) => None
          case (dst, src) =>
            val bad = Seq(
              if (dst.isEmpty) Option(c) else None,
              if (src.isEmpty) Option(c2) else None)
              .flatten.map(n => s"'$n'")
            throw new IllegalArgumentException(
              s"SHALLOW CLONE: cannot resolve ${bad.mkString(" and ")} " +
                "to a graft table — no registered graft catalog " +
                "(spark.sql.catalog.<name>) serves that identifier; " +
                "use a quoted path or register the catalog")
        }
      case ZOrder(a, b, c, cols, files, a2, b2, c2) =>
        val cs = cols.split(",").map(_.trim.stripPrefix("`")
          .stripSuffix("`")).filter(_.nonEmpty).toSeq
        tbl(a, b, c).map(GraftZOrderCommand(_, cs,
          Option(files).map(_.toInt),
          if (a2 == null && b2 == null && c2 == null) None
          else Some(path(a2, b2, c2))))
      case _ => None
    }

  private def intervalMillis(n: Long, unit: String): Long =
    unit.toUpperCase.stripSuffix("S") match {
      case "MINUTE" => n * 60L * 1000L
      case "HOUR" => n * 3600L * 1000L
      case "DAY" => n * 24L * 3600L * 1000L
    }
}

/** `ALTER TABLE ... ADD CONSTRAINT n CHECK (e)`: validates the whole
  * existing table in one counting scan and refuses loudly on
  * violations — [[Constraints.add]] semantics verbatim. */
final case class GraftAddConstraintCommand(
    path: String, name: String, expr: String)
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    Constraints.add(sparkSession, path, name, expr)
    Seq.empty
  }
}

/** `ALTER TABLE ... DROP CONSTRAINT [IF EXISTS] n` — idempotent like
  * [[Constraints.drop]]. */
final case class GraftDropConstraintCommand(path: String, name: String)
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    Constraints.drop(sparkSession, path, name)
    Seq.empty
  }
}

/** `SHOW CONSTRAINTS g` — (name, expression), name-ascending. */
final case class GraftShowConstraintsCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("expression", StringType, nullable = false))))
  override def run(sparkSession: SparkSession): Seq[Row] =
    Constraints.list(sparkSession, path).toSeq.sortBy(_._1)
      .map { case (n, e) => Row(n, e) }
}

/** `DESCRIBE HISTORY g` — one row per readable generation, driver
  * side only ([[Maintenance.history]]). */
final case class GraftDescribeHistoryCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("version", IntegerType, nullable = false),
      StructField("is_current", BooleanType, nullable = false),
      StructField("replaced_at", TimestampType, nullable = true),
      StructField("n_files", IntegerType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("index_columns", StringType, nullable = false))))
  override def run(sparkSession: SparkSession): Seq[Row] =
    Maintenance.history(sparkSession, path).collect().toIndexedSeq
}

/** `RESTORE [TABLE] g TO VERSION AS OF n` — metadata-only roll-back
  * to a retained generation ([[Maintenance.restore]]; the outgoing
  * generation is archived first, so a restore is itself undoable). */
final case class GraftRestoreCommand(path: String, version: Int)
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    Maintenance.restore(sparkSession, path, version)
    Seq.empty
  }
}

/** `ANALYZE TABLE g COMPUTE STATISTICS FOR COLUMNS (c1, c2)` builds
  * the per-file column-stats sidecar ([[graft.core.ColumnStats
  * .build]] — min/max ranges on NON-index columns that prune scans
  * the lex bounds can't); `ANALYZE TABLE g COMPUTE BLOOM [FPP p]
  * FOR COLUMNS (c)` builds the Bloom sidecar ([[graft.core
  * .BloomIndex.build]] — point-lookup file skipping). The SQL route
  * to the same indexes the write options (`option("stats", ...)`,
  * `option("bloom", ...)`) declare at write time — the piece an
  * ADOPTED table (CONVERT TO GRAFT / COPY INTO / shallow clone)
  * needs, since its files were written elsewhere. One job over the
  * table's files; maintenance ops keep the sidecars fresh from then
  * on ([[Maintenance.refreshBloom]]). */
final case class GraftAnalyzeCommand(
    path: String, bloom: Boolean, cols: Seq[String],
    fpp: Option[Double], allColumns: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("index", StringType, nullable = false),
      StructField("columns", StringType, nullable = false),
      StructField("n_files", IntegerType, nullable = false))))
  override def run(sparkSession: SparkSession): Seq[Row] = {
    // FOR ALL COLUMNS: every NON-INDEX column of a type the target
    // sidecar supports (index columns already prune through the lex
    // bounds — a stats/bloom entry for them is redundant bytes), so
    // an adopted table gets full pruning in one statement.
    val effective =
      if (!allColumns) cols
      else {
        val m = graft.core.Sidecar.load(sparkSession, path)
        val idx = m.indexColumns.toSet
        m.schema.fields.iterator
          .filterNot(f => idx.contains(f.name))
          .filter(f =>
            if (bloom) graft.core.BloomIndex.supported(f.dataType)
            else graft.core.ColumnStats.supported(f.dataType))
          .map(_.name).toSeq
      }
    require(effective.nonEmpty,
      if (allColumns)
        "ANALYZE TABLE ... FOR ALL COLUMNS: no non-index column of a " +
          "supported type to analyze"
      else "ANALYZE TABLE needs at least one column")
    if (bloom)
      graft.core.BloomIndex.build(sparkSession, path, effective,
        fpp.getOrElse(0.01))
    else {
      require(fpp.isEmpty, "FPP applies to COMPUTE BLOOM only")
      graft.core.ColumnStats.build(sparkSession, path, effective)
    }
    val n = graft.core.Sidecar.load(sparkSession, path).files.length
    Seq(Row(if (bloom) "bloom" else "stats",
      effective.mkString(","), n))
  }
}

/** `CREATE TABLE dst SHALLOW CLONE src [VERSION AS OF n]` — zero-copy
  * metadata-only table branch ([[Maintenance.shallowClone]]): the new
  * table references the source's data files by absolute path and
  * diverges copy-on-write. Both idents accept the graft path forms
  * and catalog names; a named target lands at its catalog's
  * `<warehouse>/<namespace>/<name>` path and is immediately readable
  * by name (identifier→path is a pure mapping). */
final case class GraftCloneCommand(
    dstPath: String, srcPath: String,
    version: Option[Int], tsMillis: Option[Long],
    ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("cloned_files", IntegerType, nullable = false))))
  override def run(sparkSession: SparkSession): Seq[Row] = {
    if (ifNotExists &&
        graft.core.Sidecar.exists(sparkSession, dstPath))
      return Seq(Row(0))
    Seq(Row(tsMillis match {
      case Some(ts) =>
        Maintenance.shallowCloneAsOf(sparkSession, srcPath, dstPath, ts)
      case None =>
        Maintenance.shallowClone(sparkSession, srcPath, dstPath, version)
    }))
  }
}

/** `OPTIMIZE g [WHERE p] TARGET n ROWS` — bin-pack small files up to
  * the target ([[Maintenance.compact]]: reads only sub-target files).
  * With WHERE, only the files the sidecar pruning walk keeps for `p`
  * are considered and only contiguous runs of them merge
  * ([[Maintenance.compactWhere]] — compacting one hot key band of a
  * 100 TB table costs O(that band)). Returns the report counts. */
final case class GraftOptimizeCommand(path: String, targetRows: Long,
    where: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("rewritten", IntegerType, nullable = false),
      StructField("dropped", IntegerType, nullable = false),
      StructField("merged", IntegerType, nullable = false),
      StructField("created", IntegerType, nullable = false),
      StructField("untouched", IntegerType, nullable = false))))
  override def run(sparkSession: SparkSession): Seq[Row] = {
    // Delta's OPTIMIZE applies pending deletion vectors while it
    // rewrites — same here, and it is the SQL-level remedy that
    // un-wedges UPDATE/MERGE after a DELETE FROM (which serves
    // merge-on-read and leaves vectors pending).
    if (graft.operators.DeletionVectors.exists(sparkSession, path))
      graft.operators.DeletionVectors.materialize(sparkSession, path)
    val r = where match {
      case Some(w) => Maintenance.compactWhere(sparkSession, path,
        org.apache.spark.sql.GraftBridge.toColumn(
          sparkSession.sessionState.sqlParser.parseExpression(w)),
        targetRows)
      case None => Maintenance.compact(sparkSession, path, targetRows)
    }
    Seq(Row(r.rewritten, r.dropped, r.merged, r.created, r.untouched))
  }
}

/** `OPTIMIZE g RECLUSTER [RETAIN]` — whole-table re-sort restoring
  * disjoint range layout after overlapping appends
  * ([[Maintenance.recluster]]: pending deletion vectors fold in, the
  * txn ledger / constraints / rename map survive, RETAIN archives the
  * replaced generation). The remedy when OVERLAP, not file count, is
  * the problem; `OPTIMIZE ... TARGET n ROWS` stays the small-file
  * remedy. */
final case class GraftReclusterCommand(path: String, retain: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("rewritten", IntegerType, nullable = false),
      StructField("dropped", IntegerType, nullable = false),
      StructField("merged", IntegerType, nullable = false),
      StructField("created", IntegerType, nullable = false),
      StructField("untouched", IntegerType, nullable = false))))
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val r = Maintenance.recluster(sparkSession, path, retain)
    Seq(Row(r.rewritten, r.dropped, r.merged, r.created, r.untouched))
  }
}

/** `CONVERT TO GRAFT '/dir' INDEX (c1, c2)` — adopt a bare parquet
  * directory in place as a graft table (the Delta CONVERT shape):
  * one stats job over the existing files builds the sidecar, zero
  * data rewritten; every engine surface (pruned scans, maintenance,
  * SQL row-level ops, COPY INTO) then applies. Converting an
  * existing graft table is a no-op reporting the current state. */
final case class GraftConvertCommand(path: String, index: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("files", IntegerType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("already_graft", BooleanType, nullable = false))))
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val already = graft.core.Sidecar.exists(sparkSession, path)
    if (!already) {
      require(index.nonEmpty,
        "CONVERT TO GRAFT requires INDEX (c1[, c2...]): the columns " +
          "the table is range-clustered and pruned on")
      graft.core.PDataset.writeMetadata(sparkSession, path, index)
    }
    val m = graft.core.Sidecar.load(sparkSession, path)
    Seq(Row(m.files.length, m.sizes.sum, already))
  }
}

/** `COPY INTO g FROM '/landing' FILEFORMAT = PARQUET [PATTERN = p]
  * [FORMAT_OPTIONS('k'='v',...)] [FORCE]` — idempotent incremental
  * file ingestion: each source file loads exactly once across
  * re-runs ([[graft.operators.CopyInto]]; the ledger rides the data
  * commit). Returns the per-statement load report. */
final case class GraftCopyIntoCommand(path: String, source: String,
    format: String, pattern: String,
    formatOptions: Map[String, String], force: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("files_listed", IntegerType, nullable = false),
      StructField("files_skipped", IntegerType, nullable = false),
      StructField("files_loaded", IntegerType, nullable = false),
      StructField("rows_loaded", LongType, nullable = false))))
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val r = graft.operators.CopyInto.copyInto(sparkSession, path,
      source, format, pattern, formatOptions, force)
    Seq(Row(r.filesListed, r.filesSkipped, r.filesLoaded, r.rowsLoaded))
  }
}

/** `DESCRIBE DETAIL g` — one driver-side row summarizing the table:
  * listing size, row count, index columns, constraint count, pending
  * deletion vectors, retained generations. Zero data files read. */
final case class GraftDescribeDetailCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("location", StringType, nullable = false),
      StructField("index_columns", StringType, nullable = false),
      StructField("n_files", IntegerType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("size_bytes", LongType, nullable = false),
      StructField("n_constraints", IntegerType, nullable = false),
      StructField("pending_deletion_vectors", BooleanType,
        nullable = false),
      StructField("retained_versions", IntegerType, nullable = false),
      StructField("copy_ledger_entries", IntegerType,
        nullable = false),
      StructField("cloned_from", StringType, nullable = true),
      // a shallow clone's divergence meter: how many listed files
      // still read from the source (0 = fully localized)
      StructField("external_files", IntegerType, nullable = false),
      // the recluster signal: deepest file overlap of the key space
      // (1 = perfectly clustered; -> n as appends degrade pruning)
      StructField("layout_max_overlap", IntegerType, nullable = false))))
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val m = graft.core.Sidecar.load(sparkSession, path)
    val (_, dirPath) = graft.core.GraftFs.resolve(sparkSession, path)
    val bytes = graft.core.GraftFs.fileSizes(
      sparkSession.sparkContext.hadoopConfiguration,
      m.files.map(f =>
        new org.apache.hadoop.fs.Path(dirPath, f).toString))
      .map(_._2).sum
    Seq(Row(path, m.indexColumns.mkString(","), m.files.length,
      m.sizes.sum, bytes,
      Constraints.list(sparkSession, path).size,
      graft.operators.DeletionVectors.exists(sparkSession, path),
      Maintenance.versions(sparkSession, path).length,
      m.copyLedger.size,
      m.extras.get("clonedFrom").map(_.toString).orNull,
      m.files.count(Maintenance.isExternalEntry),
      Maintenance.layoutHealth(sparkSession, path).maxOverlap))
  }
}

/** `VACUUM g RETAIN LAST n [OLDER THAN ...]` / `VACUUM g OLDER THAN
  * ('<ts>' | [INTERVAL] n HOURS|DAYS|MINUTES)` — deletes unreferenced
  * archived generations ([[Maintenance.vacuum]]); returns the number
  * of data files deleted. Kept = the union of both clauses. The BARE
  * form refuses: dropping ALL retained history (destroying time
  * travel and change-feed checkpoint recovery) must be opt-in via an
  * explicit `RETAIN LAST 0` — the retention-safe default Delta's
  * VACUUM has, expressed as a required clause. */
final case class GraftVacuumCommand(
    path: String,
    retainLast: Option[Int],
    olderThanTs: Option[Long],
    olderThanInterval: Option[Long],
    dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("deleted_files", IntegerType, nullable = false))))
  override def run(sparkSession: SparkSession): Seq[Row] = {
    // DRY RUN touches nothing, so the bare form is allowed there —
    // "what would a full vacuum reclaim" is a legitimate question.
    require(dryRun || retainLast.isDefined || olderThanTs.isDefined ||
      olderThanInterval.isDefined,
      s"bare VACUUM would delete ALL retained generations of $path, " +
        "destroying time travel and change-feed checkpoint recovery; " +
        "say what to keep: VACUUM ... RETAIN LAST n (n may be 0 to " +
        "opt into the full clean) and/or VACUUM ... OLDER THAN " +
        "'<timestamp>' | [INTERVAL] n HOURS|DAYS|MINUTES " +
        "(append DRY RUN to preview without deleting)")
    // the interval form resolves against the wall clock at RUN time
    val cutoff: Option[Long] = (olderThanTs.toSeq ++ olderThanInterval
      .map(System.currentTimeMillis() - _).toSeq)
      .reduceOption(math.min(_: Long, _: Long))
    Seq(Row(Maintenance.vacuum(sparkSession, path,
      retainLast.getOrElse(0), cutoff, dryRun = dryRun)))
  }
}

/** `RESTORE [TABLE] g TO TIMESTAMP AS OF '<ts>'` — roll back to the
  * generation that was current at the instant ([[Maintenance
  * .restoreAsOf]]; a timestamp at/after the newest archive is the
  * current generation, a no-op). */
final case class GraftRestoreTimestampCommand(path: String, ts: Long)
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    Maintenance.restoreAsOf(sparkSession, path, ts)
    Seq.empty
  }
}

/** `OPTIMIZE g ZORDER BY (c1, c2) [TARGET n FILES] [INTO g2]` —
  * multi-dimensional re-clustering via [[graft.operators.Layout]]:
  * one quantile job, one range shuffle on the interleaved z-value,
  * one narrow stats pass; the destination reopens through
  * [[graft.operators.Layout.zorderRead]] with plan-time pruning on
  * EVERY clustered column.
  *
  * `INTO g2` writes a clustered COPY (any source kind: graft
  * dataset, z-order dir, plain parquet). WITHOUT it the directory is
  * re-clustered in place — allowed for z-order dirs (re-tighten after
  * appends) and plain parquet; refused for a graft dataset, whose
  * lex index, history and constraints a z-order rewrite would
  * destroy (write INTO a new directory instead). In-place snapshots
  * the rows to a sibling staging dir first, so the overwrite never
  * reads the files it replaces. */
final case class GraftZOrderCommand(
    path: String,
    cols: Seq[String],
    targetFiles: Option[Int],
    into: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("files_written", IntegerType, nullable = false))))
  override def run(sparkSession: SparkSession): Seq[Row] = {
    import graft.core.{GraftFs, Sidecar}
    import graft.operators.Layout
    require(cols.nonEmpty, "ZORDER BY needs at least one column")
    val (fs, srcPath) = GraftFs.resolve(sparkSession, path)
    val isGraft = Sidecar.exists(sparkSession, path)
    val isZorder = GraftFs.isFile(fs,
      new org.apache.hadoop.fs.Path(srcPath, Layout.MetaFile))
    def readSource(): org.apache.spark.sql.DataFrame =
      if (isGraft) graft.core.PDataset.scanParquet(sparkSession, path).toDF
      else if (isZorder) Layout.zorderRead(sparkSession, path)
      else sparkSession.read.parquet(path)
    def dataFileCount(dir: String): Int = {
      val (f, p) = GraftFs.resolve(sparkSession, dir)
      GraftFs.listStatuses(f, p).count { st =>
        val n = st.getPath.getName
        st.isFile && n.endsWith(".parquet") && !n.startsWith("_") &&
          !n.startsWith(".")
      }
    }
    val target = targetFiles.getOrElse(math.max(1, dataFileCount(path)))
    into match {
      case Some(dst) =>
        Layout.zorderWrite(readSource(), dst, cols, target)
        Seq(Row(dataFileCount(dst)))
      case None =>
        require(!isGraft,
          s"in-place OPTIMIZE ZORDER would destroy the graft sidecar " +
            s"(lex index, history, constraints) of $path; write a " +
            "clustered copy with INTO '<new dir>' instead")
        // snapshot rows out of the way, then overwrite the dir from
        // the snapshot — the rewrite never reads what it replaces
        val parent = Option(srcPath.getParent).getOrElse(srcPath)
        val stage = GraftFs.mkStageDir(fs, parent, ".graft-zorder-",
          srcPath.getName)
        try {
          val snap = new org.apache.hadoop.fs.Path(stage, "snap").toString
          readSource().write.parquet(snap)
          Layout.zorderWrite(
            sparkSession.read.parquet(snap), path, cols, target)
        } finally GraftFs.deleteRecursive(fs, stage)
        Seq(Row(dataFileCount(path)))
    }
  }
}
