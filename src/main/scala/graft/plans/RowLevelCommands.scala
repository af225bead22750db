package graft.plans

import org.apache.spark.sql.{Column, GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases,
  UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  AttributeSet, Attribute, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable,
  UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Sidecar
import graft.operators.Maintenance
import graft.sources.{GraftSource, GraftTable}

/** SQL `UPDATE` and `MERGE INTO` on graft catalog tables — the two
  * statements every Delta-style CDC consumer writes first — via an
  * analyzer rewrite (injected by [[graft.GraftExtensions]]) onto the
  * engine's own row-level primitives instead of Spark's
  * `SupportsRowLevelOperations` group-based machinery:
  *
  *   UPDATE graft.db.t SET v = v * 2, s = 'U' WHERE k % 7 = 0
  *   MERGE INTO graft.db.t USING src ON t.k = src.k
  *     WHEN MATCHED AND src.op = 'D' THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  *     WHEN NOT MATCHED BY SOURCE THEN ...
  *
  * The rewrite fires once the statement is fully resolved and the
  * target is a [[GraftTable]]; everything else is left to Spark.
  * UPDATE lands on [[Maintenance.updateWhere]] (copy-on-write over
  * only the files with hits, found via the read path's own sidecar
  * pruning). MERGE classifies matched / not-matched rows with ONE
  * join per side against the source and lands on
  * [[Maintenance.merge]] — one commit, one rewrite of only the
  * affected partitions, exactly the O(delta + affected files) cost
  * shape of the programmatic API at any table size.
  *
  * Boundaries (all loud errors, never wrong rows): the MERGE ON
  * clause must contain a `target.indexCol = <source expression>`
  * equality for every index column (the keyed primitives key on the
  * clustering index); any FURTHER deterministic conjunct (`AND
  * t.region = s.region`, `AND s.op <> 'noop'`, …) is honored with
  * full SQL MERGE semantics by the classification joins, refusing
  * only the two shapes the keyed apply cannot express — an insert
  * whose key already exists in the target, and a duplicate-key
  * target whose rows the residual tells apart; UPDATE/MERGE
  * assignments to
  * index columns are allowed for UPDATE (files re-sort, bounds
  * recompute) but refused for MERGE (a key change inside a keyed
  * merge would strand the old key); subqueries inside conditions or
  * assignments are not supported; snapshot reads (`VERSION AS OF`)
  * refuse mutation.
  */
final class GraftRowLevelRewrite(session: SparkSession)
    extends Rule[LogicalPlan] {
  import GraftRowLevel._

  private def graftTableOf(plan: LogicalPlan): Option[GraftTable] =
    EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        Some(r.table.asInstanceOf[GraftTable])
      case _ => None
    }

  private def checkNoSubquery(es: Seq[Expression], stmt: String): Unit =
    es.foreach { e =>
      if (e.exists(_.isInstanceOf[SubqueryExpression]))
        throw new UnsupportedOperationException(
          s"$stmt on graft tables does not support subqueries in " +
            "conditions or assignments; materialize the subquery as a " +
            "source table and use MERGE INTO")
      // the rewrite evaluates conditions in more than one pass
      // (discovery + rewrite / classification + apply): a
      // non-deterministic expression would select different rows in
      // each and corrupt the commit
      if (!e.deterministic)
        throw new UnsupportedOperationException(
          s"$stmt on graft tables requires deterministic conditions " +
            s"and assignments; `${e.sql}` is non-deterministic")
    }

  private def requireCurrent(gt: GraftTable, stmt: String): Unit =
    if (gt.snapshot) throw new UnsupportedOperationException(
      s"${gt.name()} is a read-only snapshot (VERSION/TIMESTAMP AS " +
        s"OF); $stmt the current table instead")

  /** Top-level assignment target name (nested fields refused). */
  private def colName(key: Expression, stmt: String): String = key match {
    case a: AttributeReference => a.name
    case other => throw new UnsupportedOperationException(
      s"$stmt on graft tables supports only top-level column " +
        s"assignments, got ${other.sql}")
  }

  /** Rebind target-column references by NAME so the expression
    * re-resolves against any frame carrying the table's columns (the
    * per-file rewrite scans updateWhere runs are fresh reads with
    * fresh exprIds). */
  private def nameBased(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  private def clauseOf(a: MergeAction, stmt: String): MergeClause =
    a match {
      case UpdateAction(c, assigns, _) =>
        UpdateClause(c.map(ExprBox), assigns.map(x =>
          colName(x.key, stmt) -> ExprBox(x.value)))
      case DeleteAction(c) => DeleteClause(c.map(ExprBox))
      case InsertAction(c, assigns) =>
        InsertClause(c.map(ExprBox), assigns.map(x =>
          colName(x.key, stmt) -> ExprBox(x.value)))
      case other => throw new UnsupportedOperationException(
        s"$stmt clause ${other.getClass.getSimpleName} is not " +
          "supported on graft tables")
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u @ UpdateTable(target, assignments, condition) if u.resolved =>
        graftTableOf(target) match {
          case None => u
          case Some(gt) =>
            requireCurrent(gt, "UPDATE")
            checkNoSubquery(
              assignments.map(_.value) ++ condition.toSeq, "UPDATE")
            GraftUpdateCommand(gt.path,
              assignments.map(a =>
                colName(a.key, "UPDATE") -> ExprBox(nameBased(a.value))),
              condition.map(c => ExprBox(nameBased(c))))
        }
      case mi @ MergeIntoTable(target, source, cond, matched, notMatched,
          notMatchedBySource, withSchemaEvolution) if mi.resolved =>
        graftTableOf(target) match {
          case None => mi
          case Some(gt) =>
            requireCurrent(gt, "MERGE INTO")
            // WITH SCHEMA EVOLUTION needs no work here: Spark's
            // ResolveMergeIntoSchemaEvolution already widened the
            // table through GraftCatalog.alterTable (AddColumn →
            // Maintenance.addColumns, a metadata-only commit) and
            // re-resolved the statement against the evolved schema
            // before this rewrite fires on the RESOLVED node;
            // unsupported change kinds (type widening) refuse loudly
            // in alterTable.
            val exprs = cond +:
              (matched ++ notMatched ++ notMatchedBySource).flatMap(a =>
                a.condition.toSeq ++ (a match {
                  case UpdateAction(_, as, _) => as.map(_.value)
                  case InsertAction(_, as) => as.map(_.value)
                  case _ => Seq.empty
                }))
            checkNoSubquery(exprs, "MERGE INTO")
            GraftMergeCommand(gt.path,
              PlanBox(EliminateSubqueryAliases(target)), PlanBox(source),
              ExprBox(cond),
              matched.map(clauseOf(_, "MERGE INTO")),
              notMatched.map(clauseOf(_, "MERGE INTO")),
              notMatchedBySource.map(clauseOf(_, "MERGE INTO")),
              evolve = withSchemaEvolution)
        }
    }
}

object GraftRowLevel {
  /** Opaque holders: QueryPlan.expressions walks a command's product
    * fields (recursing through Seq/Option) and CheckAnalysis would
    * then demand the captured expressions' attributes in the leaf
    * command's (empty) input — boxing keeps them invisible to the
    * tree machinery while the command carries them to run() time. */
  final case class ExprBox(e: Expression)
  final case class PlanBox(plan: LogicalPlan)

  sealed trait MergeClause { def cond: Option[ExprBox] }
  final case class UpdateClause(
      cond: Option[ExprBox], assigns: Seq[(String, ExprBox)])
      extends MergeClause
  final case class DeleteClause(cond: Option[ExprBox]) extends MergeClause
  final case class InsertClause(
      cond: Option[ExprBox], assigns: Seq[(String, ExprBox)])
      extends MergeClause

  /** SQL row-level mutations default to non-retained commits (the
    * programmatic defaults) — fast, but they leave no time-travel
    * point and a caught-up change-feed stream cannot cross them.
    * `SET spark.graft.sql.retain=true` makes every SQL UPDATE /
    * MERGE / REPLACE WHERE a retained generation (Delta's behavior:
    * versioned commits that feed CDF), at the cost of keeping the
    * replaced files until VACUUM. A table that FEEDS a change
    * stream should not depend on every writer's session conf:
    * `TBLPROPERTIES('graft.retain'='true')` pins the behavior on
    * the TABLE (stored in the sidecar), and either switch retains. */
  val SqlRetainKey = "spark.graft.sql.retain"
  def sqlRetain(spark: SparkSession, dir: String): Boolean =
    spark.conf.getOption(SqlRetainKey)
      .exists(_.trim.equalsIgnoreCase("true")) ||
      (try graft.core.Sidecar.load(spark, dir).tableOptions.exists {
        case (k, v) => k.equalsIgnoreCase("retain") &&
          v.trim.equalsIgnoreCase("true")
      } catch { case _: Exception => false })

  val reportSchema: StructType = StructType(Seq(
    StructField("rewritten", IntegerType, nullable = false),
    StructField("dropped", IntegerType, nullable = false),
    StructField("merged", IntegerType, nullable = false),
    StructField("created", IntegerType, nullable = false),
    StructField("untouched", IntegerType, nullable = false)))

  def reportRow(r: Maintenance.Report): Seq[Row] =
    Seq(Row(r.rewritten, r.dropped, r.merged, r.created, r.untouched))
}

/** `UPDATE graft.db.t SET ... [WHERE ...]` →
  * [[Maintenance.updateWhere]]: copy-on-write over only the files
  * with matching rows (sidecar-pruned + one pushed-down discovery
  * scan); returns the maintenance report counts. */
final case class GraftUpdateCommand(
    path: String,
    assignments: Seq[(String, GraftRowLevel.ExprBox)],
    condition: Option[GraftRowLevel.ExprBox])
    extends LeafRunnableCommand {
  import GraftRowLevel._
  override val output: Seq[Attribute] =
    DataTypeUtils.toAttributes(reportSchema)
  override def run(sparkSession: SparkSession): Seq[Row] =
    reportRow(Maintenance.updateWhere(sparkSession, path,
      condition.map(b => GraftBridge.toColumn(b.e)).getOrElse(lit(true)),
      assignments.map { case (n, b) => n -> GraftBridge.toColumn(b.e) },
      retain = sqlRetain(sparkSession, path)))
}

/** `MERGE INTO graft.db.t USING src ON ...` → ONE inner join
  * classifies matched rows (first satisfied WHEN clause wins, the
  * Delta/SQL:2003 order), one anti join per remaining side, then the
  * engine's [[Maintenance.merge]] applies all updates + inserts +
  * deletes in a single commit that rewrites only affected
  * partitions. An empty target (CREATE TABLE then MERGE as initial
  * load) takes the sink's plain append path for the insert clauses. */
final case class GraftMergeCommand(
    path: String,
    target: GraftRowLevel.PlanBox,
    source: GraftRowLevel.PlanBox,
    mergeCond: GraftRowLevel.ExprBox,
    matched: Seq[GraftRowLevel.MergeClause],
    notMatched: Seq[GraftRowLevel.MergeClause],
    notMatchedBySource: Seq[GraftRowLevel.MergeClause],
    evolve: Boolean = false)
    extends LeafRunnableCommand {
  import GraftRowLevel._

  override val output: Seq[Attribute] =
    DataTypeUtils.toAttributes(reportSchema)

  private def unsupportedOn(detail: String): Nothing =
    throw new UnsupportedOperationException(
      "MERGE INTO a graft table needs an ON clause containing a " +
        "`target.<indexCol> = <source expression>` equality for " +
        "every index column (extra deterministic conjuncts are " +
        s"honored as residual match conditions); $detail")

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val spark = sparkSession
    // WITH SCHEMA EVOLUTION, part 2: Spark's own evolution rule adds
    // MISSING columns (alterTable AddColumn) before this command is
    // built, but it does not widen an existing column's type for a
    // wider source — and this command casts every assignment to the
    // SIDECAR schema at run time, so a bigint source landing in an
    // int column would overflow. Widen the sidecar first (metadata-
    // only, Maintenance.widenColumns) for every common column whose
    // source type is a safe parquet-level widening of the target's;
    // everything below then casts to the widened type.
    if (evolve) {
      val cur = Sidecar.load(spark, path).schema
      val srcType = source.plan.output.map(a => a.name -> a.dataType).toMap
      val resolver = spark.sessionState.conf.resolver
      val widenings = cur.fields.toSeq.flatMap { f =>
        srcType.collectFirst {
          case (n, t) if resolver(n, f.name) &&
              Maintenance.safeWidening(f.dataType, t) => f.name -> t
        }
      }
      if (widenings.nonEmpty)
        Maintenance.widenColumns(spark, path, widenings: _*)
    }
    val m = Sidecar.load(spark, path)
    val keyCols = m.indexColumns.toSeq
    require(keyCols.nonEmpty,
      "MERGE INTO needs index columns on the target; reindex first")
    val dataCols = m.schema.fieldNames.toSeq
    val tgtPlan = target.plan
    val srcPlan = source.plan
    val tgtSet = AttributeSet(tgtPlan.output)
    val srcSet = AttributeSet(srcPlan.output)

    // Split ON into bare index-key equalities — they drive the keyed
    // apply (replace/delete by index tuple) — and RESIDUAL conjuncts,
    // which narrow the match set below "same key". Residuals are
    // evaluated exactly by the classification joins below (full SQL
    // MERGE semantics); every index column must still carry a key
    // equality so the apply stays O(affected partitions).
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case x => Seq(x)
    }
    def asKeyEq(e: Expression): Option[String] = e match {
      case EqualTo(l, r) =>
        val t =
          if (l.references.subsetOf(tgtSet) &&
            r.references.subsetOf(srcSet)) Some(l)
          else if (r.references.subsetOf(tgtSet) &&
            l.references.subsetOf(srcSet)) Some(r)
          else None
        t.collect {
          case a: AttributeReference if keyCols.contains(a.name) => a.name
        }
      case _ => None
    }
    val conjuncts = split(mergeCond.e)
    val covered = conjuncts.flatMap(asKeyEq)
    val residual = conjuncts.filter(c => asKeyEq(c).isEmpty)
    val missing = keyCols.filterNot(covered.contains)
    if (missing.nonEmpty)
      unsupportedOn(s"index column(s) ${missing.mkString(", ")} are " +
        "not constrained")

    (matched ++ notMatchedBySource).foreach {
      case UpdateClause(_, assigns) =>
        assigns.collect {
          case (n, _) if keyCols.contains(n) => n
        }.headOption.foreach(n =>
          throw new UnsupportedOperationException(
            s"MERGE UPDATE may not assign index column $n (the keyed " +
              "merge would strand the old key); use WHEN MATCHED THEN " +
              "DELETE plus WHEN NOT MATCHED THEN INSERT instead"))
      case _ => ()
    }

    def c(b: ExprBox): Column = GraftBridge.toColumn(b.e)
    val tgtAttr: Map[String, Column] =
      tgtPlan.output.map(a => a.name -> GraftBridge.toColumn(a)).toMap
    val fieldType: Map[String, org.apache.spark.sql.types.DataType] =
      m.schema.fields.map(f => f.name -> f.dataType).toMap
    // PERSIST the source before classification: the inner join and
    // the two anti joins each re-evaluate it, and a non-deterministic
    // source (sample, limit) drawing different rows per pass would
    // drop a row from both sides or land it in both — the same
    // reason Delta materializes its MERGE source.
    val src = GraftBridge.ofRows(spark, srcPlan).persist()
    try {

    // Empty target: nothing can match — the insert clauses are an
    // initial load through the sink's append (one shuffle, delta
    // stats), the same path INSERT INTO takes.
    if (m.files.isEmpty) {
      val inserts = insertFrames(src, notMatched, dataCols, fieldType, c)
      inserts.reduceOption(_ unionByName _).foreach { rows =>
        val sqlc = rows.sparkSession
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          .sqlContext
        new GraftSource().createRelation(sqlc,
          org.apache.spark.sql.SaveMode.Append,
          Map("path" -> path, "index" -> keyCols.mkString(",")), rows)
      }
      // report the initial load honestly: every file now in the
      // sidecar was created by this MERGE
      return reportRow(Maintenance.Report(0, 0, 0,
        Sidecar.load(spark, path).files.length, 0))
    }

    val tgt = GraftBridge.ofRows(spark, tgtPlan)
    val onCol = GraftBridge.toColumn(mergeCond.e)

    // First satisfied clause wins; a NULL clause condition is false.
    def actionIdx(clauses: Seq[MergeClause]): Column =
      clauses.zipWithIndex.foldRight(lit(null).cast(IntegerType)) {
        case ((cl, i), acc) =>
          when(coalesce(cl.cond.map(c).getOrElse(lit(true)), lit(false)),
            lit(i)).otherwise(acc)
      }

    def updateRow(assigns: Map[String, ExprBox]): Seq[Column] =
      dataCols.map { cn =>
        assigns.get(cn)
          .map(b => c(b).cast(fieldType(cn)).as(cn))
          .getOrElse(tgtAttr(cn).as(cn))
      }
    def keyRow: Seq[Column] = keyCols.map(k => tgtAttr(k).as(k))

    def frames(df: org.apache.spark.sql.DataFrame,
        clauses: Seq[MergeClause]):
        (Seq[org.apache.spark.sql.DataFrame],
          Seq[org.apache.spark.sql.DataFrame]) = {
      if (clauses.isEmpty) return (Seq.empty, Seq.empty)
      val tagged = df.withColumn("__graft_act", actionIdx(clauses))
      val upd = clauses.zipWithIndex.collect {
        case (UpdateClause(_, assigns), i) =>
          tagged.filter(col("__graft_act") === i)
            .select(updateRow(assigns.toMap): _*)
      }
      val del = clauses.zipWithIndex.collect {
        case (DeleteClause(_), i) =>
          tagged.filter(col("__graft_act") === i).select(keyRow: _*)
      }
      (upd, del)
    }

    val (matchedUpd, matchedDel) =
      frames(tgt.join(src, onCol, "inner"), matched)
    val inserts = insertFrames(
      src.join(tgt, onCol, "left_anti"), notMatched, dataCols,
      fieldType, c)
    val (nmsUpd, nmsDel) =
      frames(tgt.join(src, onCol, "left_anti"), notMatchedBySource)

    // Residual ON conjuncts: the joins above already honored them
    // exactly, but the keyed apply replaces/deletes WHOLE index keys.
    // Two shapes it cannot express are refused loudly here, never
    // silently misapplied. Each guard is one narrow key-column job
    // and runs ONLY when residuals are present.
    if (residual.nonEmpty) {
      val keyC = keyCols.map(col)
      def fmtKeys(rows: Array[Row]): String =
        rows.map(r => keyCols.zipWithIndex.map { case (k, i) =>
          s"$k=${r.get(i)}" }.mkString("(", ", ", ")")).mkString(", ")
      // 1. a WHEN NOT MATCHED insert whose key already exists in the
      //    target (its pair failed a residual conjunct): the keyed
      //    apply would silently turn that insert into an update.
      inserts.reduceOption(_ unionByName _).foreach { ins =>
        val collide = ins.select(keyC: _*)
          .join(tgt.select(keyC: _*), keyCols, "left_semi")
          .distinct().limit(5).collect()
        if (collide.nonEmpty) throw new UnsupportedOperationException(
          "MERGE INTO: the residual ON condition(s) `" +
            residual.map(_.sql).mkString(" AND ") + "` left source " +
            "row(s) unmatched whose key(s) already exist in the " +
            s"target (${fmtKeys(collide)}), so the WHEN NOT MATCHED " +
            "insert would duplicate those keys; narrow the source, " +
            "or move the residual condition into the WHEN clauses " +
            "so those rows classify as MATCHED")
      }
      // 2. a residual that reads target non-key columns can tell
      //    ROWS OF ONE KEY apart on a duplicate-key target — a
      //    partially-matched key would lose its unmatched siblings
      //    to the whole-key replace/delete.
      val readsTargetData = residual.exists(_.references.exists(a =>
        tgtSet.contains(a) && !keyCols.contains(a.name)))
      val touchedKeys = (matchedUpd ++ matchedDel ++ nmsUpd ++ nmsDel)
        .map(_.select(keyC: _*)).reduceOption(_ unionByName _)
      if (readsTargetData) touchedKeys.foreach { ks =>
        val dup = tgt.select(keyC: _*)
          .join(ks.distinct(), keyCols, "left_semi")
          .groupBy(keyC: _*).count().filter(col("count") > 1)
          .select(keyC: _*).limit(5).collect()
        if (dup.nonEmpty) throw new UnsupportedOperationException(
          "MERGE INTO: the residual ON condition(s) `" +
            residual.map(_.sql).mkString(" AND ") + "` read target " +
            "non-index columns while the target holds duplicate " +
            s"index keys (${fmtKeys(dup)}); the keyed apply acts on " +
            "whole keys and would drop the key's unmatched rows — " +
            "deduplicate the target or key the ON on index " +
            "equalities only")
      }
    }

    val updates = (matchedUpd ++ inserts ++ nmsUpd)
      .reduceOption(_ unionByName _)
    val deletes = (matchedDel ++ nmsDel).reduceOption(_ unionByName _)
    val retain = sqlRetain(spark, path)
    // The keyed primitives validate the applied delta in one fused
    // aggregate and refuse duplicate update keys / update∩delete
    // overlap with a generic message. Those requirements are exactly
    // SQL MERGE's multiple-rows-matched cardinality rule (Delta's
    // DELTA_MULTIPLE_SOURCE_ROW_MATCHING error), so on that failure —
    // never in the happy path, which pays zero extra jobs — diagnose
    // which keys were ambiguous and raise the MERGE-specific error.
    val report =
      try (updates, deletes) match {
        case (Some(u), Some(dk)) =>
          Maintenance.merge(spark, path, u, dk, retain)
        case (Some(u), None) => Maintenance.upsert(spark, path, u, retain)
        case (None, Some(dk)) =>
          Maintenance.deleteKeys(spark, path, dk, retain)
        case (None, None) => Maintenance.Report(0, 0, 0, 0, m.files.length)
      } catch {
        case e: IllegalArgumentException
            if e.getMessage != null &&
              (e.getMessage.contains("update keys must be unique") ||
                e.getMessage.contains("both updates and deletes")) =>
          throw mergeCardinalityError(updates, deletes, keyCols, e)
      }
    reportRow(report)
    } finally { src.unpersist(); () }
  }

  /** Name the keys that made the merge ambiguous: either one target
    * key matched (or was inserted by) more than one source row, or a
    * key landed in both an UPDATE/INSERT and a DELETE clause. Runs
    * ONLY after the fused validation aggregate has already refused —
    * a diagnostic pass over the delta, not a tax on every MERGE. */
  private def mergeCardinalityError(
      updates: Option[org.apache.spark.sql.DataFrame],
      deletes: Option[org.apache.spark.sql.DataFrame],
      keyCols: Seq[String],
      cause: IllegalArgumentException): UnsupportedOperationException = {
    def fmt(rows: Array[Row]): String =
      rows.map(r => keyCols.zipWithIndex.map { case (k, i) =>
        s"$k=${r.get(i)}" }.mkString("(", ", ", ")")).mkString(", ")
    val kc = keyCols.map(col)
    val dupUpd = updates.map(u => u.select(kc: _*)
      .groupBy(kc: _*).count().filter(col("count") > 1)
      .select(kc: _*).limit(5).collect()).getOrElse(Array.empty[Row])
    val both = (updates, deletes) match {
      case (Some(u), Some(dk)) => u.select(kc: _*)
        .join(dk.select(kc: _*), keyCols, "left_semi")
        .distinct().limit(5).collect()
      case _ => Array.empty[Row]
    }
    val detail =
      (if (dupUpd.nonEmpty)
        Seq(s"key(s) ${fmt(dupUpd)} receive more than one UPDATE/INSERT " +
          "row") else Seq.empty) ++
      (if (both.nonEmpty)
        Seq(s"key(s) ${fmt(both)} land in both an UPDATE/INSERT and a " +
          "DELETE clause") else Seq.empty)
    new UnsupportedOperationException(
      "MERGE INTO cannot apply: multiple source rows matched the same " +
        "target key (SQL MERGE requires each target row to match at " +
        "most one source row — the same cardinality rule Delta " +
        s"enforces); ${detail.mkString("; ")}. Deduplicate the source " +
        "on the index key (e.g. keep the latest row per key) and retry.",
      cause)
  }

  /** Insert rows for the not-matched source side: each clause's
    * assignments fill the target schema (unassigned columns are
    * NULL, SQL INSERT semantics), first satisfied clause wins. */
  private def insertFrames(
      unmatchedSrc: org.apache.spark.sql.DataFrame,
      clauses: Seq[MergeClause],
      dataCols: Seq[String],
      fieldType: Map[String, org.apache.spark.sql.types.DataType],
      c: ExprBox => Column): Seq[org.apache.spark.sql.DataFrame] = {
    if (clauses.isEmpty) return Seq.empty
    val idx = clauses.zipWithIndex.foldRight(lit(null).cast(IntegerType)) {
      case ((cl, i), acc) =>
        when(coalesce(cl.cond.map(c).getOrElse(lit(true)), lit(false)),
          lit(i)).otherwise(acc)
    }
    val tagged = unmatchedSrc.withColumn("__graft_act", idx)
    clauses.zipWithIndex.collect {
      case (InsertClause(_, assigns), i) =>
        val am = assigns.toMap
        tagged.filter(col("__graft_act") === i).select(dataCols.map {
          cn =>
            am.get(cn)
              .map(b => c(b).cast(fieldType(cn)).as(cn))
              .getOrElse(lit(null).cast(fieldType(cn)).as(cn))
        }: _*)
      case (other, _) if !other.isInstanceOf[InsertClause] =>
        throw new UnsupportedOperationException(
          "only INSERT clauses are valid WHEN NOT MATCHED on graft " +
            s"tables, got ${other.getClass.getSimpleName}")
    }
  }
}
