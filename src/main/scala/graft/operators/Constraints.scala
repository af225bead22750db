package graft.operators

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftFs, PDataset, Sidecar, TypedJson}

/** Table CHECK constraints (the Delta `ALTER TABLE ADD CONSTRAINT`
  * analogue): named boolean SQL expressions recorded in a KB-scale
  * `_graft_constraints.json` sidecar and enforced on every write path
  * that adds rows — the graft sink (fresh write and append),
  * [[Maintenance.upsert]] and [[Maintenance.merge]]. Deletes cannot
  * violate a CHECK and stay unguarded.
  *
  * Semantics are ANSI CHECK: a row passes when the expression is TRUE
  * or NULL; only FALSE violates (`NOT NULL` is spelled
  * `c IS NOT NULL`, where NULL input yields FALSE and so enforces).
  *
  * The scale contract: [[add]] is the only full-table scan (one
  * counting aggregate, filters/columns pruned to what the expression
  * needs); every write-time check is ONE aggregate pass over the
  * DELTA — all constraints evaluated together in a single job,
  * violation counts per constraint — so enforcement cost tracks the
  * write, not the table. [[Maintenance.dropColumns]] refuses to drop
  * a column a constraint references (the expression would error on
  * every later write), mirroring the deletion-vector guard pattern.
  */
object Constraints {

  val FileName = "_graft_constraints.json"

  final class Violation(msg: String) extends IllegalStateException(msg)

  private def filePath(spark: SparkSession, dir: String): HPath = {
    val (_, dirPath) = GraftFs.resolve(spark, dir)
    new HPath(dirPath, FileName)
  }

  /** The table's constraints, name -> SQL expression (empty when none
    * are recorded). */
  def list(spark: SparkSession, dir: String): Map[String, String] = {
    val (fs, _) = GraftFs.resolve(spark, dir)
    val p = filePath(spark, dir)
    if (!GraftFs.isFile(fs, p)) Map.empty
    else TypedJson.parse(GraftFs.readString(fs, p))
      .asInstanceOf[Map[String, Any]]("constraints")
      .asInstanceOf[Map[String, Any]]
      .map { case (k, v) => k -> v.toString }
  }

  private def save(
      spark: SparkSession, dir: String, cs: Map[String, String]): Unit = {
    val (fs, _) = GraftFs.resolve(spark, dir)
    val p = filePath(spark, dir)
    if (cs.isEmpty) { fs.delete(p, false); () }
    else GraftFs.writeString(fs, p,
      TypedJson.write(Map("constraints" -> cs)))
  }

  /** Record constraint `name` after validating the EXISTING data in
    * one counting scan — a violated table refuses the constraint
    * loudly (with the offending row count) instead of recording a
    * check that every future write would then trip over. */
  def add(
      spark: SparkSession, dir: String, name: String,
      sqlExpr: String): Unit = {
    require(name.nonEmpty, "constraint name must be non-empty")
    val existing = list(spark, dir)
    require(!existing.contains(name),
      s"constraint $name already exists (${existing(name)}); drop it first")
    // Parse eagerly so a typo fails here, not inside a later write.
    val c = expr(sqlExpr)
    val bad = PDataset.scanParquet(spark, dir).toDF
      .agg(violationCount(c).as("n")).head().getLong(0)
    if (bad > 0) throw new Violation(
      s"cannot add constraint $name ($sqlExpr): $bad existing " +
        s"row(s) of $dir violate it")
    save(spark, dir, existing + (name -> sqlExpr))
  }

  /** Re-install a captured constraint set verbatim — the sink's
    * Overwrite path, where the incoming data was already enforced and
    * the directory replacement dropped the sidecar; no re-scan. */
  private[graft] def install(
      spark: SparkSession, dir: String, cs: Map[String, String]): Unit =
    save(spark, dir, cs)

  /** Remove constraint `name` (absent names are a no-op: drop is
    * idempotent cleanup, not a lookup). */
  def drop(spark: SparkSession, dir: String, name: String): Unit =
    save(spark, dir, list(spark, dir) - name)

  /** The table's constraints as a DataFrame (name, expression),
    * name-ascending — the plain-SQL listing behind
    * `spark.read.format("graft").option("constraints", true)`. */
  def show(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    list(spark, dir).toSeq.sortBy(_._1).toDF("name", "expression")
  }

  /** rows where the CHECK is FALSE (TRUE and NULL both pass) */
  private def violationCount(c: Column): Column =
    count(when(not(coalesce(c, lit(true))), 1))

  /** Per-constraint violation counts of `df` against the table's
    * constraints, computed in ONE aggregate job — the dry-run audit
    * behind [[enforce]], also useful directly for vetting a candidate
    * delta before a write. Returns (name, n_bad), name-ascending. */
  def audit(
      spark: SparkSession, dir: String, df: DataFrame): DataFrame = {
    import spark.implicits._
    val cs = list(spark, dir).toSeq.sortBy(_._1)
    if (cs.isEmpty) return Seq.empty[(String, Long)].toDF("name", "n_bad")
    val counts = df.agg(
      violationCount(expr(cs.head._2)).as("c0"),
      cs.tail.zipWithIndex.map { case ((_, e), i) =>
        violationCount(expr(e)).as(s"c${i + 1}") }: _*).head()
    cs.zipWithIndex
      .map { case ((n, _), i) => n -> counts.getLong(i) }
      .toDF("name", "n_bad")
  }

  /** Write-path guard: one aggregate pass over `delta`; throws
    * [[Violation]] naming every violated constraint and its row
    * count. A table with no constraints costs nothing (no job). */
  private[graft] def enforce(
      spark: SparkSession, dir: String, delta: DataFrame,
      op: String): Unit = {
    if (list(spark, dir).isEmpty) return
    val bad = audit(spark, dir, delta)
      .filter(col("n_bad") > 0).collect()
    if (bad.nonEmpty) throw new Violation(
      s"$op on $dir violates " + bad.map(r =>
        s"constraint ${r.getString(0)} (${r.getLong(1)} row(s))")
        .mkString(", "))
  }

  /** Guard for [[Maintenance.dropColumns]]: refuse to drop a column
    * some constraint references. */
  private[operators] def requireUnreferenced(
      spark: SparkSession, dir: String, cols: Seq[String]): Unit = {
    val cs = list(spark, dir)
    if (cs.isEmpty) return
    val lower = cols.map(_.toLowerCase).toSet
    val hit = cs.filter { case (_, e) =>
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(e).references
        .map(_.name.toLowerCase).exists(lower)
    }
    if (hit.nonEmpty) throw new IllegalStateException(
      s"cannot drop column(s) ${cols.mkString(", ")}: referenced by " +
        s"constraint(s) ${hit.keys.toSeq.sorted.mkString(", ")}; drop " +
        "the constraint(s) first")
  }
}
