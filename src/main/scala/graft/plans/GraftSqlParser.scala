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
  *   VACUUM graft.`/p` [RETAIN LAST 3]
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

  // graft.`/path` (Delta-style) or a bare '/path' string literal
  private val T = """(?:graft\s*\.\s*`([^`]+)`|'([^']+)')"""
  private def path(a: String, b: String): String =
    Option(a).getOrElse(b)

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
      """(?:\s+RETAIN\s+LAST\s+(\d+))?\s*;?\s*""").r
  private val Restore =
    ("""(?is)\s*RESTORE\s+(?:TABLE\s+)?""" + T +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  private val Optimize =
    ("""(?is)\s*OPTIMIZE\s+""" + T +
      """\s+TARGET\s+(\d+)\s+ROWS\s*;?\s*""").r
  private val DescDetail =
    ("""(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+""" + T + """\s*;?\s*""").r

  private[plans] def parseGraft(sql: String): Option[LogicalPlan] =
    sql match {
      case AddConstraint(a, b, name, expr) =>
        Some(GraftAddConstraintCommand(path(a, b), name, expr.trim))
      case DropConstraint(a, b, name) =>
        Some(GraftDropConstraintCommand(path(a, b), name))
      case ShowConstraints(a, b) =>
        Some(GraftShowConstraintsCommand(path(a, b)))
      case DescHistory(a, b) =>
        Some(GraftDescribeHistoryCommand(path(a, b)))
      case DescDetail(a, b) =>
        Some(GraftDescribeDetailCommand(path(a, b)))
      case Vacuum(a, b, n) =>
        Some(GraftVacuumCommand(path(a, b),
          Option(n).map(_.toInt).getOrElse(0)))
      case Restore(a, b, v) =>
        Some(GraftRestoreCommand(path(a, b), v.toInt))
      case Optimize(a, b, rows) =>
        Some(GraftOptimizeCommand(path(a, b), rows.toLong))
      case _ => None
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

/** `OPTIMIZE g TARGET n ROWS` — bin-pack small files up to the
  * target ([[Maintenance.compact]]: reads only sub-target files).
  * Returns the rewrite report counts. */
final case class GraftOptimizeCommand(path: String, targetRows: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("rewritten", IntegerType, nullable = false),
      StructField("dropped", IntegerType, nullable = false),
      StructField("merged", IntegerType, nullable = false),
      StructField("created", IntegerType, nullable = false),
      StructField("untouched", IntegerType, nullable = false))))
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val r = Maintenance.compact(sparkSession, path, targetRows)
    Seq(Row(r.rewritten, r.dropped, r.merged, r.created, r.untouched))
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
      StructField("retained_versions", IntegerType, nullable = false))))
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
      Maintenance.versions(sparkSession, path).length))
  }
}

/** `VACUUM g [RETAIN LAST n]` — deletes unreferenced archived
  * generations ([[Maintenance.vacuum]]); returns the number of data
  * files deleted. */
final case class GraftVacuumCommand(path: String, retainLast: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("deleted_files", IntegerType, nullable = false))))
  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(Maintenance.vacuum(sparkSession, path, retainLast)))
}
