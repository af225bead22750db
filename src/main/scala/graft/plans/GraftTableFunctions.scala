package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.operators.Maintenance

/** SQL table-valued access to the change-data feed — the Delta
  * `table_changes` idea for graft tables, registered by
  * [[graft.GraftExtensions]] via `injectTableFunction`:
  *
  *   SELECT * FROM graft_changes('/data/events', 2)       -- v2 → now
  *   SELECT * FROM graft_changes('/data/events', 2, 5)    -- v2 → v5
  *   SELECT * FROM graft_changes('cat.db.t', '2026-08-01')
  *
  * NUMERIC endpoints (int or bigint) are generation numbers
  * ([[Maintenance.changes]] — Delta's `table_changes` contract);
  * string endpoints are timestamps ([[Maintenance.changesAsOf]] —
  * "what changed since last night's run" without tracking generation
  * numbers; epoch millis, instants, or dates, the same forms the
  * source's time-travel options accept). The first argument is a
  * table path or a graft-catalog name. Being a TVF, the feed composes
  * inside any query — joins, filters, aggregation over the
  * `change_type` column — and the plan underneath is the same
  * O(per-generation delta) file diff the programmatic feed plans,
  * with filters pushed into the delta-file scans by Catalyst.
  */
object GraftTableFunctions {

  /** Install the TVFs into a session's extension points. */
  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectTableFunction((
      FunctionIdentifier("graft_changes"),
      new ExpressionInfo("graft", null, "graft_changes",
        "graft_changes(table, from[, to]) - change-data feed of a " +
          "graft table between two generations (ints) or instants " +
          "(strings); `to` defaults to the current generation.", ""),
      changesBuilder))
    // DESCRIBE HISTORY as a composable relation: `SELECT max(version)
    // FROM graft_history('/p')` instead of collecting the statement.
    ext.injectTableFunction((
      FunctionIdentifier("graft_history"),
      new ExpressionInfo("graft", null, "graft_history",
        "graft_history(table) - one row per readable generation " +
          "(version, is_current, replaced_at, n_files, n_rows, " +
          "index_columns); driver-side metadata only.", ""),
      { args =>
        require(args.length == 1,
          s"graft_history(table) takes 1 argument; got ${args.length}")
        Maintenance.history(SparkSession.active,
          resolveTarget(strArg(args.head, "table", "graft_history")))
          .queryExecution.logical
      }))
    // Per-file layout introspection ("which key band is hot, how much
    // of my clone still reads from the source") as a relation —
    // driver-side sidecar walk, no data job.
    // Backlink observability for the clone-protection surface: which
    // clones were registered against this table, are they live, and
    // how many of THIS table's files does each still reference —
    // read-only (no stale pruning), driver-side marker walk.
    ext.injectTableFunction((
      FunctionIdentifier("graft_clones"),
      new ExpressionInfo("graft", null, "graft_clones",
        "graft_clones(table) - one row per registered clone backlink " +
          "(clone, registered_at, live, external_refs); driver-side " +
          "metadata only.", ""),
      { args =>
        require(args.length == 1,
          s"graft_clones(table) takes 1 argument; got ${args.length}")
        val spark = SparkSession.active
        val dir = resolveTarget(strArg(args.head, "table", "graft_clones"))
        import org.apache.spark.sql.types._
        val rows: Seq[org.apache.spark.sql.Row] =
          Maintenance.registeredClones(spark, dir).map {
            case (clone, at, live, refs) =>
              org.apache.spark.sql.Row(clone,
                new java.sql.Timestamp(at), live, refs)
          }
        val schema = StructType(Seq(
          StructField("clone", StringType, nullable = false),
          StructField("registered_at", TimestampType, nullable = false),
          StructField("live", BooleanType, nullable = false),
          StructField("external_refs", org.apache.spark.sql.types.LongType,
            nullable = false)))
        import scala.jdk.CollectionConverters._
        spark.createDataFrame(rows.asJava, schema).queryExecution.logical
      }))
    ext.injectTableFunction((
      FunctionIdentifier("graft_files"),
      new ExpressionInfo("graft", null, "graft_files",
        "graft_files(table) - one row per listed data file (file, " +
          "rows, size_bytes, lower_bound, upper_bound, external); " +
          "driver-side metadata only.", ""),
      filesBuilder))
  }

  private def filesBuilder: Seq[Expression] => LogicalPlan = { args =>
    require(args.length == 1,
      s"graft_files(table) takes 1 argument; got ${args.length}")
    val spark = SparkSession.active
    val dir = resolveTarget(strArg(args.head, "table", "graft_files"))
    val m = graft.core.Sidecar.load(spark, dir)
    val (_, dirPath) = graft.core.GraftFs.resolve(spark, dir)
    val bytes = graft.core.GraftFs.fileSizes(
      graft.core.GraftFs.conf(spark),
      m.files.map(f => new org.apache.hadoop.fs.Path(dirPath, f).toString))
      .map(_._2)
    def render(b: graft.core.Lex.Bound): String =
      b.map(v => String.valueOf(v.orNull)).mkString("[", ",", "]")
    val rows: Seq[org.apache.spark.sql.Row] = m.files.indices.map { i =>
      org.apache.spark.sql.Row(m.files(i), m.sizes(i), bytes(i),
        render(m.lowerBounds(i)), render(m.upperBounds(i)),
        Maintenance.isExternalEntry(m.files(i)))
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("rows", org.apache.spark.sql.types.LongType,
        nullable = false),
      StructField("size_bytes", org.apache.spark.sql.types.LongType,
        nullable = false),
      StructField("lower_bound", StringType, nullable = false),
      StructField("upper_bound", StringType, nullable = false),
      StructField("external", BooleanType, nullable = false)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema).queryExecution.logical
  }

  private def changesBuilder: Seq[Expression] => LogicalPlan = { args =>
    require(args.length == 2 || args.length == 3,
      s"graft_changes(table, from[, to]) takes 2 or 3 arguments; " +
        s"got ${args.length}")
    val spark = SparkSession.active
    val dir = resolveTarget(strArg(args.head, "table"))
    val df = (endpoint(args(1), "from"), args.lift(2).map(endpoint(_, "to"))) match {
      case (Left(fromV), to) =>
        Maintenance.changes(spark, dir, fromV, to.map(_.left.getOrElse(
          throw new IllegalArgumentException(
            "graft_changes: from/to endpoints must be the same kind " +
              "(both versions or both timestamps)"))))
      case (Right(fromTs), to) =>
        Maintenance.changesAsOf(spark, dir, fromTs, to.map(_.getOrElse(
          throw new IllegalArgumentException(
            "graft_changes: from/to endpoints must be the same kind " +
              "(both versions or both timestamps)"))))
    }
    df.queryExecution.logical
  }

  /** A catalog-qualified graft table name, else a literal path. */
  private def resolveTarget(t: String): String =
    graft.sources.GraftCatalog.resolveName(t).getOrElse(t)

  private def strArg(
      e: Expression, what: String,
      fn: String = "graft_changes"): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a string literal; got $other")
  }

  /** Left = generation number, Right = timestamp millis. The
    * contract is Delta's `table_changes`: NUMERIC endpoints are
    * generations (an Int or a BIGINT literal — a CAST(2 AS BIGINT)
    * must not silently time-travel to 1970 as epoch millis), STRING
    * endpoints are timestamps. */
  private def endpoint(e0: Expression, what: String): Either[Int, Long] = {
    // TVF builders run pre-analysis: a CAST(0 AS BIGINT) arrives as an
    // unfolded Cast over a literal — fold foldable endpoints here.
    val e: Expression = e0 match {
      case l: Literal => l
      case f if f.foldable && f.deterministic =>
        try Literal.create(f.eval(null), f.dataType)
        catch { case _: Exception => f }
      case other => other
    }
    e match {
      case Literal(v: Int, IntegerType) => Left(v)
      case Literal(v: Long, LongType) =>
        require(v >= 0 && v <= Int.MaxValue,
          s"graft_changes: $what generation $v out of range; pass " +
            "timestamps as string literals (numeric endpoints are " +
            "generations)")
        Left(v.toInt)
      case Literal(v, StringType) if v != null =>
        Right(graft.sources.GraftSource.parseTs(v.toString))
      case other => throw new IllegalArgumentException(
        s"graft_changes: $what must be a numeric generation or a " +
          s"string timestamp literal; got $other")
    }
  }
}
