package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Cast, Expression, ExprId, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

import graft.core.{Sidecar, Stats}
import graft.operators.IncrementalAgg

/** Opt-in materialized-view rewrite: an `Aggregate` whose child scans
  * the view's source dataset (its exact CURRENT file set) and whose
  * shape the view can answer — grouping on any subset of the view's
  * group columns, aggregates limited to `count(*)` / `count(col)` /
  * `sum(col)` / `avg(col)` over the view's sum columns (plus
  * `min`/`max` over its min/max columns) — is rewritten to aggregate
  * the view instead: `count(*)` becomes `sum(n)`, `count(col)`
  * becomes `sum(col_nn)`, `sum(col)` becomes `sum(col_sum)`. A
  * 100 TB fact scan turns into a view-sized read with identical
  * results.
  *
  * Soundness gates, all checked per invocation:
  *   - the view must be fresh ([[IncrementalAgg.isFresh]] — source
  *     sidecar content hash equals the one recorded at last refresh);
  *     a stale view silently declines, it never rewrites wrong.
  *   - the scanned file set must equal the source's current sidecar
  *     listing exactly, so a time-travel scan of an OLD generation
  *     (same directory, different files) is never rewritten.
  *   - aggregates must be plain (no DISTINCT, no FILTER).
  *     `count(col)` over a sum column answers from the view's
  *     per-measure non-null counts (`<c>_nn`); a decimal-typed
  *     `sum`/`avg` declines (the view's partial sums are doubles —
  *     rewriting would silently round where the scan is exact).
  *
  * Register on a session via [[ViewRewrite.register]] (appends to
  * `spark.experimental.extraOptimizations`, the user-rule batch that
  * runs after the main optimizer). The rewrite re-aggregates the view
  * (one tiny shuffle) even for an exact grouping match — one code
  * path answers rollups and exact matches alike, and Catalyst's AQE
  * collapses the small aggregate.
  */
class ViewRewrite(spark: SparkSession, val viewDir: String)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val meta =
      try Some(cachedViewMeta())
      catch { case scala.util.control.NonFatal(_) => None }
    meta match {
      case Some(m) =>
        val freshFiles =
          try {
            if (cachedSrcHash(m.srcDir) == m.baseMetaHash)
              Some(currentFiles(m.srcDir))
            else None
          } catch { case scala.util.control.NonFatal(_) => None }
        freshFiles match {
          case Some(srcFiles) => plan.transformUp {
            case agg: Aggregate =>
              matchScan(agg.child, srcFiles, m.groupCols.toSet) match {
                case Some(filterOpt) =>
                  rewrite(agg, m, filterOpt).getOrElse(agg)
                case None => agg
              }
          }
          case None => plan
        }
      case _ => plan
    }
  }

  // The rule runs on EVERY query plan of the session: cache the view
  // meta and the source's normalized file set behind (mtime, length)
  // fingerprints of their metadata files, so steady state is two
  // driver stat calls per plan, not JSON reads.
  private var metaCache: Option[((Long, Long), IncrementalAgg.ViewMeta)] =
    None
  private var filesCache: Option[((Long, Long), Set[String])] = None
  private var hashCache: Option[((Long, Long), String)] = None

  private def cachedSrcHash(srcDir: String): String = synchronized {
    val fp = fingerprint(Sidecar.metadataPath(srcDir))
    hashCache match {
      case Some((`fp`, h)) if !recent(fp) => h
      case _ =>
        val h = IncrementalAgg.srcMetaHash(spark, srcDir)
        // Only post-granularity reads are memoized: a write landing
        // in the same mtime tick with equal length would otherwise
        // permanently pin the pre-mutation value under this fp.
        if (!recent(fp)) hashCache = Some((fp, h))
        h
    }
  }

  private def fingerprint(path: org.apache.hadoop.fs.Path): (Long, Long) = {
    val (fs, _) = graft.core.GraftFs.resolve(spark, path.toString)
    val st = fs.getFileStatus(path)
    (st.getModificationTime, st.getLen)
  }

  // Freshness gates CORRECTNESS here, so the (mtime, length)
  // fingerprint is not trusted while the file's mtime is within the
  // filesystem's timestamp granularity of now: two rewrites inside
  // one granularity tick with equal byte length would collide on the
  // fingerprint and serve a pre-mutation hash. Once the mtime is old,
  // any new write necessarily bumps it.
  private val MtimeGranularityMs = 2000L
  private def recent(fp: (Long, Long)): Boolean =
    System.currentTimeMillis() - fp._1 < MtimeGranularityMs

  private def cachedViewMeta(): IncrementalAgg.ViewMeta = synchronized {
    val p = new org.apache.hadoop.fs.Path(viewDir,
      IncrementalAgg.MetaFile)
    val fp = fingerprint(p)
    metaCache match {
      case Some((`fp`, m)) if !recent(fp) => m
      case _ =>
        val m = IncrementalAgg.viewMeta(spark, viewDir)
        if (!recent(fp)) metaCache = Some((fp, m))
        m
    }
  }

  /** The source's current file listing, normalized for comparison
    * with `FileIndex.inputFiles` (which may carry a `file:` scheme). */
  private def currentFiles(srcDir: String): Set[String] = synchronized {
    val fp = fingerprint(Sidecar.metadataPath(srcDir))
    filesCache match {
      case Some((`fp`, s)) if !recent(fp) => s
      case _ =>
        val m = Sidecar.load(spark, srcDir)
        val p = new org.apache.hadoop.fs.Path(srcDir)
        val s = m.files.map(f =>
          Stats.normalizePath(new org.apache.hadoop.fs.Path(p, f).toString))
          .toSet
        if (!recent(fp)) filesCache = Some((fp, s))
        s
    }
  }

  /** The aggregate's child is a (possibly column-pruning-projected)
    * file scan over EXACTLY the source's current files, optionally
    * under deterministic filters touching only the view's group
    * columns — such filters partition whole groups, so they push
    * through onto the view untouched. Stacked Filter nodes (which
    * the optimizer usually, but not always, collapses before user
    * rules run) fold conjunctively. Returns the combined filter
    * (None = bare scan) when the shape matches. */
  private def matchScan(
      p: LogicalPlan,
      srcFiles: Set[String],
      groupNames: Set[String],
      filterSeen: Option[Expression] = None): Option[Option[Expression]] =
    p match {
      case Project(projs, child)
          if projs.forall(_.isInstanceOf[AttributeReference]) =>
        matchScan(child, srcFiles, groupNames, filterSeen)
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child)
          if cond.deterministic &&
            cond.references.forall(a => groupNames(a.name)) =>
        val folded = filterSeen
          .map(org.apache.spark.sql.catalyst.expressions.And(_, cond))
          .orElse(Some(cond))
        matchScan(child, srcFiles, groupNames, folded)
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            val scanned =
              fs.location.inputFiles.map(Stats.normalizePath).toSet
            if (scanned.nonEmpty && scanned == srcFiles) Some(filterSeen)
            else None
          case _ => None
        }
      case _ => None
    }

  private def rewrite(
      agg: Aggregate,
      m: IncrementalAgg.ViewMeta,
      srcFilter: Option[Expression]): Option[LogicalPlan] = {
    val groupNames = m.groupCols.toSet
    val sumNames = m.sumCols.toSet
    val minMaxNames = m.minMaxCols.toSet
    // Grouping: attributes only, each one of the view's group columns.
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if groupNames(a.name) => a
      case _ => return None
    }
    val viewPlan = graft.core.PDataset.scanParquet(spark, viewDir)
      .toDF.queryExecution.analyzed
    val viewAttr = viewPlan.output.map(a => a.name -> a).toMap
    def viewSum(name: String): Expression =
      AggregateExpression(Sum(viewAttr(name)), Complete, isDistinct = false)
    def viewMin(name: String): Expression =
      AggregateExpression(Min(viewAttr(name)), Complete, isDistinct = false)
    def viewMax(name: String): Expression =
      AggregateExpression(Max(viewAttr(name)), Complete, isDistinct = false)
    def retyped(e: Expression, want: org.apache.spark.sql.types.DataType) =
      if (e.dataType == want) e else Cast(e, want)
    def decimalTyped(t: org.apache.spark.sql.types.DataType) =
      t.isInstanceOf[org.apache.spark.sql.types.DecimalType]

    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupNames(a.name) =>
        Alias(viewAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, name) if groupNames(a.name) =>
        Alias(viewAttr(a.name), name)(exprId = al.exprId)
      case al @ Alias(
          AggregateExpression(fn, Complete, false, None, _), name) =>
        fn match {
          // coalesce to 0: a global (no GROUP BY) count over an
          // EMPTY view must be 0 like count(*) is, not sum's NULL
          case Count(Seq(Literal(1, _))) =>
            import org.apache.spark.sql.catalyst.expressions.Coalesce
            Alias(retyped(Coalesce(Seq(viewSum("n"), Literal(0L))),
              al.dataType), name)(exprId = al.exprId)
          // count(col) IS the view's per-measure non-null count:
          // count(c) = coalesce(sum(<c>_nn), 0) exactly.
          case Count(Seq(a: AttributeReference)) if sumNames(a.name) =>
            import org.apache.spark.sql.catalyst.expressions.Coalesce
            Alias(retyped(Coalesce(Seq(viewSum(s"${a.name}_nn"),
              Literal(0L))), al.dataType), name)(exprId = al.exprId)
          // The view's partial sums are doubles; a decimal-typed sum
          // (the one result type where the source scan is exact past
          // double precision) must not be silently double-rounded.
          case Sum(a: AttributeReference, _)
              if sumNames(a.name) && !decimalTyped(al.dataType) =>
            Alias(retyped(viewSum(s"${a.name}_sum"), al.dataType),
              name)(exprId = al.exprId)
          // avg(c) = sum of partial sums / sum of NON-NULL counts —
          // the view tracks <c>_nn precisely so null measures divide
          // correctly (`n` would overcount them). An all-null group
          // yields null like avg would, not an ANSI division error.
          case Average(a: AttributeReference, _)
              if sumNames(a.name) && !decimalTyped(al.dataType) =>
            import org.apache.spark.sql.catalyst.expressions.{Divide,
              EqualTo, If}
            import org.apache.spark.sql.types.DoubleType
            val nn = viewSum(s"${a.name}_nn")
            val safeAvg = If(EqualTo(nn, Literal(0L)),
              Literal(null, DoubleType),
              Divide(viewSum(s"${a.name}_sum"), Cast(nn, DoubleType)))
            Alias(retyped(safeAvg, al.dataType), name)(exprId = al.exprId)
          // min-of-mins / max-of-maxes are exact for any delta the
          // view accepted (insert-only — refresh enforces it)
          case Min(a: AttributeReference) if minMaxNames(a.name) =>
            Alias(retyped(viewMin(s"${a.name}_min"), al.dataType),
              name)(exprId = al.exprId)
          case Max(a: AttributeReference) if minMaxNames(a.name) =>
            Alias(retyped(viewMax(s"${a.name}_max"), al.dataType),
              name)(exprId = al.exprId)
          case _ => return None
        }
      case _ => return None
    }
    // A group-column filter partitions whole groups: apply it to the
    // view's rows verbatim (attributes remapped by name).
    val filtered = srcFilter match {
      case Some(cond) =>
        org.apache.spark.sql.catalyst.plans.logical.Filter(
          cond.transform {
            case a: AttributeReference => viewAttr(a.name)
          }, viewPlan)
      case None => viewPlan
    }
    // The optimizer's column-pruning batch already ran (this is a
    // user rule), so narrow the view scan explicitly: a Project of
    // just the referenced view columns lets FileSourceStrategy's
    // PhysicalOperation prune the parquet read schema.
    val needed =
      (org.apache.spark.sql.catalyst.expressions.AttributeSet(
        groupAttrs.map(a => viewAttr(a.name))) ++
        org.apache.spark.sql.catalyst.expressions.AttributeSet(
          newAggExprs.flatMap(_.references))).toSeq
    Some(Aggregate(groupAttrs.map(a => viewAttr(a.name)), newAggExprs,
      Project(needed, filtered)))
  }
}

object ViewRewrite {

  /** Make every matching aggregate on this session read `viewDir`
    * instead of its source (when fresh — see class doc).
    * Idempotent: registering the same view twice is a no-op. */
  def register(spark: SparkSession, viewDir: String): Unit = {
    import org.apache.spark.sql.classic
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    val already = exp.extraOptimizations.exists {
      case v: ViewRewrite => v.viewDir == viewDir
      case _ => false
    }
    if (!already)
      exp.extraOptimizations ++= Seq(new ViewRewrite(spark, viewDir))
  }
}
