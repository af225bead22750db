package graft.operators

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftFs, PDataset, TypedJson}

/** Incrementally-maintained aggregate view (count + per-column sums,
  * grouped on key columns) over a versioned graft dataset — the
  * materialized-view pattern that makes "per-customer totals over a
  * 100 TB fact table" a sub-second read and a delta-sized refresh:
  *
  *   - [[build]] computes the full aggregate once and persists it as
  *     a graft dataset indexed on the group columns, recording the
  *     source generation it summarizes in a `_graft_view.json`
  *     sidecar.
  *   - [[refresh]] pulls the change feed ([[Maintenance.changes]])
  *     from the recorded generation to the source's current state,
  *     aggregates the delta with signed counts (insert +1 / delete
  *     -1, sums likewise), and merges it into the view in ONE commit
  *     via [[Maintenance.merge]] — groups whose count reaches zero
  *     are point-deleted. Cost is O(view + delta): the source is
  *     read only through the feed (just the files present in exactly
  *     one generation), never rescanned.
  *
  * Counts and sums re-derive exactly under insert/delete deltas
  * (avg = sum/count at read time). Min/max merge incrementally under
  * insert-only deltas, and distinct-count sketches (`distinctCols`:
  * per-group Datasketches HLL, `hll_union`-merged) likewise; a delta
  * containing deletes triggers a targeted REPAIR — min/max and
  * sketches recomputed for only the delta's groups via one semi-join
  * scan of the source (IN-prefiltered when the group list is small,
  * so a group-clustered source prunes) — never a full rebuild.
  * Contract: every source mutation between refreshes must be a
  * maintenance op run with `retain = true` (otherwise the outgoing
  * generation is not archived and the feed cannot see it — refresh
  * fails loudly when the recorded generation is missing), and group
  * columns must be non-null (they key the view's index).
  */
object IncrementalAgg {

  val MetaFile = "_graft_view.json"

  /** Delta-group count up to which the min/max repair inlines the
    * group values as a pushed-down IN prefilter (file / row-group
    * pruning on a group-clustered source); larger deltas repair
    * through the broadcast semi join alone. */
  val MaxInlineRepairGroups = 1024L

  final case class ViewMeta(
      srcDir: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String],
      distinctCols: Seq[String],
      baseVersion: Int,
      baseMetaHash: String)

  private def sumName(c: String): String = s"${c}_sum"
  private def nnName(c: String): String = s"${c}_nn"
  private def minName(c: String): String = s"${c}_min"
  private def maxName(c: String): String = s"${c}_max"
  private def hllName(c: String): String = s"${c}_hll"

  // Sums are stored as double regardless of the source column's type:
  // refresh's signed deltas are double, so the view schema must be
  // stable across builds and refreshes (integral-valued sums stay
  // exact in double up to 2^53). Each sum column also records its
  // NON-NULL count (`<c>_nn`) so `avg(c) = <c>_sum / <c>_nn` holds
  // exactly even when the measure has nulls (the row count `n`
  // counts null measures too). Min/max keep the source type.
  private def fullAgg(
      src: DataFrame,
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String],
      distinctCols: Seq[String]): DataFrame =
    src.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sumCols.flatMap(c => Seq(
        sum(col(c).cast("double")).as(sumName(c)),
        count(col(c)).as(nnName(c)))) ++
        minMaxCols.flatMap(c => Seq(
          min(col(c)).as(minName(c)), max(col(c)).as(maxName(c)))) ++
        distinctCols.map(c =>
          hll_sketch_agg(col(c)).as(hllName(c))): _*)

  /** The generation number the source's CURRENT state will receive
    * when the next retained op archives it. */
  private def nextVersion(spark: SparkSession, srcDir: String): Int =
    Maintenance.versions(spark, srcDir).lastOption.map(_ + 1).getOrElse(0)

  private def metaPath(spark: SparkSession, viewDir: String): HPath = {
    val (_, p) = GraftFs.resolve(spark, viewDir)
    new HPath(p, MetaFile)
  }

  private def writeMeta(
      spark: SparkSession, viewDir: String, m: ViewMeta): Unit = {
    val (fs, _) = GraftFs.resolve(spark, viewDir)
    GraftFs.writeString(fs, metaPath(spark, viewDir), TypedJson.write(Map(
      "src" -> m.srcDir, "group" -> m.groupCols.toVector,
      "sums" -> m.sumCols.toVector,
      "minmax" -> m.minMaxCols.toVector,
      "distinct" -> m.distinctCols.toVector,
      "base" -> m.baseVersion.toLong,
      "base_meta_md5" -> m.baseMetaHash)))
  }

  /** The view's recorded spec + source generation. */
  def viewMeta(spark: SparkSession, viewDir: String): ViewMeta = {
    val (fs, _) = GraftFs.resolve(spark, viewDir)
    val o = TypedJson.parse(GraftFs.readString(fs, metaPath(spark, viewDir)))
      .asInstanceOf[Map[String, Any]]
    ViewMeta(
      o("src").toString,
      o("group").asInstanceOf[Vector[Any]].map(_.toString),
      o("sums").asInstanceOf[Vector[Any]].map(_.toString),
      o.getOrElse("minmax", Vector.empty[Any])
        .asInstanceOf[Vector[Any]].map(_.toString),
      o.getOrElse("distinct", Vector.empty[Any])
        .asInstanceOf[Vector[Any]].map(_.toString),
      o("base").asInstanceOf[Long].toInt,
      o("base_meta_md5").toString)
  }

  /** Whether the view reflects the source's CURRENT state — true iff
    * the source sidecar's content hash equals the one recorded at the
    * last build/refresh. The gate [[graft.plans.ViewRewrite]] checks
    * before substituting the view for a source aggregate. */
  def isFresh(spark: SparkSession, viewDir: String): Boolean =
    try {
      val m = viewMeta(spark, viewDir)
      srcMetaHash(spark, m.srcDir) == m.baseMetaHash
    } catch { case scala.util.control.NonFatal(_) => false }

  /** md5 of the source's CURRENT sidecar metadata — the content
    * identity the view is bound to. Version numbers alone cannot
    * detect an unretained mutation (a later retained op would archive
    * the WRONG content under the expected number); the hash can. */
  private[graft] def srcMetaHash(spark: SparkSession, srcDir: String): String =
    md5hex(GraftFs.readString(GraftFs.resolve(spark, srcDir)._1,
      graft.core.Sidecar.metadataPath(srcDir)))

  /** One ATOMIC read of the source's current sidecar: the parsed
    * metadata and the hash of the very bytes it was parsed from.
    * build/refresh scan and diff through this Meta, so the state the
    * view absorbs and the identity it records can never disagree —
    * a concurrent commit shifts the whole refresh to "before" or
    * "after" itself instead of splitting it. */
  private def srcSnapshot(
      spark: SparkSession, srcDir: String): (graft.core.Sidecar.Meta, String) = {
    val (fs, _) = GraftFs.resolve(spark, srcDir)
    val text = GraftFs.readString(fs,
      graft.core.Sidecar.metadataPath(srcDir))
    (graft.core.Sidecar.parseMeta(spark, srcDir, text), md5hex(text))
  }

  private def archivedMetaHash(
      spark: SparkSession, srcDir: String, v: Int): Option[String] = {
    val (fs, p) = GraftFs.resolve(spark, srcDir)
    val f = Maintenance.versionFile(p, v)
    if (GraftFs.isFile(fs, f)) Some(md5hex(GraftFs.readString(fs, f)))
    else None
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Full build: aggregate the source once and persist the view as a
    * graft dataset indexed on `groupCols` (so refreshes route and
    * rewrite only the partitions whose groups changed).
    * `minMaxCols` adds `<c>_min`/`<c>_max` columns — merged
    * incrementally for insert-only deltas, repaired per affected
    * group (one targeted source scan) when a delta contains
    * deletes. */
  /** `distinctCols` adds `<c>_hll` columns: per-group Datasketches
    * HLL sketches of the column's values. Sketches MERGE under
    * insert-only deltas (`hll_union`) and are recomputed through the
    * same targeted repair scan as min/max when a delta contains
    * deletes (a sketch cannot retract a value). Read estimates with
    * [[distinctEstimates]] or `hll_sketch_estimate` directly. */
  def build(
      spark: SparkSession,
      srcDir: String,
      viewDir: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil,
      distinctCols: Seq[String] = Nil,
      rowsPerFile: Long = 1 << 20): Unit = {
    require(groupCols.nonEmpty, "need at least one group column")
    // Snapshot the source's identity FIRST and aggregate exactly that
    // state: a commit landing mid-build then archives our snapshot
    // under the recorded number (refresh picks its delta up), instead
    // of the view recording a state it never summarized.
    val (srcMeta, srcHash) = srcSnapshot(spark, srcDir)
    val base = nextVersion(spark, srcDir)
    val src = PDataset.fromSidecarMeta(spark, srcDir, srcMeta).toDF
    val agg = fullAgg(src, groupCols, sumCols, minMaxCols, distinctCols)
    PDataset.fromDataFrame(agg, groupCols)
      .repartition(rowsPerFile)
      .writeParquet(viewDir)
    writeMeta(spark, viewDir,
      ViewMeta(srcDir, groupCols, sumCols, minMaxCols, distinctCols,
        base, srcHash))
  }

  /** The view with each `<c>_hll` sketch column replaced by its
    * distinct-value estimate (`<c>_nd`, long). */
  def distinctEstimates(spark: SparkSession, viewDir: String): DataFrame = {
    val m = viewMeta(spark, viewDir)
    m.distinctCols.foldLeft(PDataset.scanParquet(spark, viewDir).toDF) {
      (df, c) => df
        .withColumn(s"${c}_nd", hll_sketch_estimate(col(hllName(c))))
        .drop(hllName(c))
    }
  }

  /** Re-bind a MOVED or COPIED view to its source's new location.
    * The new directory must hold byte-identical sidecar content to
    * what the view last summarized (content-hash checked), so
    * retargeting never changes what the view means — only where its
    * source lives. The relocation story for datasets copied between
    * stores or promoted between environments. */
  def retarget(
      spark: SparkSession, viewDir: String, newSrcDir: String): Unit = {
    val m = viewMeta(spark, viewDir)
    if (m.srcDir == newSrcDir) return
    require(srcMetaHash(spark, newSrcDir) == m.baseMetaHash,
      s"cannot retarget the view at $viewDir to $newSrcDir: that " +
        "directory's sidecar content differs from what the view " +
        "summarized — refresh against the original source, or rebuild")
    writeMeta(spark, viewDir, m.copy(srcDir = newSrcDir))
  }

  /** Catch the view up to the source's current generation. Returns
    * the number of groups touched (updated + deleted); 0 means the
    * source had no retained changes since the last refresh. */
  def refresh(spark: SparkSession, viewDir: String): Long = {
    val m = viewMeta(spark, viewDir)
    // ONE atomic read of the source's current state: the Meta the
    // feed diffs against IS the bytes curHash identifies, so a
    // concurrent commit lands wholly before this snapshot (its delta
    // is absorbed AND recorded) or wholly after (picked up next
    // refresh) — never half.
    val (curMeta, curHash) = srcSnapshot(spark, m.srcDir)
    val cur = nextVersion(spark, m.srcDir)
    def stale(where: String): Nothing = throw new IllegalArgumentException(
      s"the view's base generation (${m.baseVersion}) $where at " +
        s"${m.srcDir} — refresh needs every source mutation since the " +
        "last refresh to run with retain = true (and vacuum to keep " +
        "the base generation); rebuild the view")
    // Sync detection is HASH-first: generation numbering restarts
    // when vacuum clears the history, so "already synced" means the
    // source's current metadata is byte-identical to what the view
    // last summarized — renumber the recorded base if needed and
    // no-op. (An unretained mutation changes the hash, so it can
    // never masquerade as synced.)
    if (curHash == m.baseMetaHash) {
      if (cur != m.baseVersion)
        writeMeta(spark, viewDir, m.copy(baseVersion = cur))
      return 0L
    }
    // Out of sync: resolve the base generation BY CONTENT. The
    // recorded number is only advisory — vacuum clears the history
    // and the next retained op renumbers from v0 (the steady state of
    // the streaming upsert-with-views sink), so when the recorded
    // number is missing or holds different bytes, scan the history
    // newest-first for the generation whose content matches what the
    // view summarized. No match = a mutation went unretained (or
    // vacuum dropped the base) — fail loudly rather than go stale.
    val baseV: Int =
      if (archivedMetaHash(spark, m.srcDir, m.baseVersion)
          .contains(m.baseMetaHash)) m.baseVersion
      else Maintenance.versions(spark, m.srcDir).reverseIterator
        .find(v => archivedMetaHash(spark, m.srcDir, v)
          .contains(m.baseMetaHash))
        .getOrElse(stale(
          "is missing and no archived generation matches what the " +
            "view summarized"))
    val groupCols = m.groupCols
    // CDF vocabulary: gains (insert / update_postimage) add, losses
    // (delete / update_preimage) retract
    val gain = col("change_type").isin("insert", "update_postimage")
    val sign = when(gain, lit(1L)).otherwise(lit(-1L))
    val feed = Maintenance.changesBetween(spark, m.srcDir,
      Maintenance.versionMeta(spark, m.srcDir, baseV), curMeta)
    // Columns whose per-group state cannot RETRACT a deleted value:
    // a delta containing deletes repairs them from the source instead
    // of merging.
    val nonRetractable = m.minMaxCols ++ m.distinctCols
    val delta = feed.groupBy(groupCols.map(col): _*).agg(
      sum(sign).as("__dn"),
      m.sumCols.flatMap(c => Seq(
        sum(sign.cast("double") * col(c)).as(s"__d_${c}"),
        sum(when(col(c).isNotNull, sign).otherwise(lit(0L)))
          .as(s"__dnn_${c}"))) ++
        (if (nonRetractable.isEmpty) Nil
         else Seq(sum(when(!gain, 1L)
           .otherwise(0L)).as("__dels"))) ++
        m.minMaxCols.flatMap(c => Seq(
          min(col(c)).as(s"__dmin_${c}"),
          max(col(c)).as(s"__dmax_${c}"))) ++
        // Sketch of the INSERTED values only: deletes contribute
        // nothing here (they trigger repair instead).
        m.distinctCols.map(c => hll_sketch_agg(
          when(gain, col(c)))
          .as(s"__dhll_${c}")): _*)
      .persist()
    try {
      // Min/max only MERGE under insert-only deltas: a delete might
      // have removed the current extremum, which least/greatest over
      // the old view row cannot recover. Instead of refusing the
      // refresh, repair by recomputing min/max for ONLY the delta's
      // groups from the source snapshot — one semi-join scan
      // restricted (when the group list is small enough to inline)
      // by a pushed-down IN filter, so a source clustered on the
      // group columns reads just the affected files/row groups. The
      // common mostly-insert workload stays O(delta + affected
      // groups); untouched groups never rescan.
      val needRepair = nonRetractable.nonEmpty &&
        !delta.filter(col("__dels") > 0L).isEmpty
      val repair: Option[DataFrame] =
        if (!needRepair) None
        else {
          val src = PDataset.fromSidecarMeta(spark, m.srcDir, curMeta)
            .toDF.select((groupCols ++ nonRetractable).map(col): _*)
          val groupsDf = delta.select(groupCols.map(col): _*)
          // The per-column IN prefilter is a SUPERSET of the delta's
          // group tuples (it decomposes a tuple set column-wise); the
          // broadcast semi join after it stays authoritative. Bounded:
          // only inlined when the delta touches few groups.
          // ONE bounded action decides inlining AND fetches the
          // groups: limit(N+1) returning ≤ N rows proves the delta
          // touches ≤ N groups (no separate count job).
          val prefiltered = try {
            val rows = groupsDf
              .limit(MaxInlineRepairGroups.toInt + 1).collect()
            if (rows.length > MaxInlineRepairGroups) src
            else groupCols.zipWithIndex.foldLeft(src) { case (d, (g, i)) =>
              val vals = rows.map(_.get(i)).distinct.toSeq
              d.filter(col(g).isin(vals: _*))
            }
          } catch { case scala.util.control.NonFatal(_) => src }
          val repairExprs =
            m.minMaxCols.flatMap(c => Seq(
              min(col(c)).as(s"__rmin_${c}"),
              max(col(c)).as(s"__rmax_${c}"))) ++
              m.distinctCols.map(c =>
                hll_sketch_agg(col(c)).as(s"__rhll_${c}"))
          Some(prefiltered
            .join(broadcast(groupsDf), groupCols.toSeq, "left_semi")
            .groupBy(groupCols.map(col): _*)
            .agg(repairExprs.head, repairExprs.tail: _*))
        }
      val view = PDataset.scanParquet(spark, viewDir).toDF
      // Existing rows of affected groups only: the view scans once
      // through a broadcast semi join; untouched groups never move.
      val affectedOld = view.join(
        broadcast(delta.select(groupCols.map(col): _*)),
        groupCols, "left_semi")
      val joined = affectedOld.join(delta, groupCols.toSeq, "full")
      val withRepair = repair match {
        case Some(r) => joined.join(r, groupCols.toSeq, "left")
        case None => joined
      }
      val merged = withRepair
        .select(
          groupCols.map(col) ++
            Seq((coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
              .as("n")) ++
            m.sumCols.flatMap { c =>
              val nn = coalesce(col(nnName(c)), lit(0L)) +
                coalesce(col(s"__dnn_${c}"), lit(0L))
              val sm = coalesce(col(sumName(c)), lit(0.0)) +
                coalesce(col(s"__d_${c}"), lit(0.0))
              // SQL sum over zero non-null values is NULL, and build
              // stores exactly that for an all-null group — so refresh
              // must too, or a refreshed group would read 0.0 where
              // the source aggregate (and the sum rewrite) says NULL.
              Seq(when(nn === 0L, lit(null).cast("double"))
                .otherwise(sm).as(sumName(c)),
                nn.as(nnName(c)))
            } ++
            m.minMaxCols.flatMap(c =>
              if (needRepair) Seq(
                // exact current extremes from the repair scan; a
                // fully-deleted group has no repair row (nulls), but
                // its n reaches 0 and the row is point-deleted below
                col(s"__rmin_${c}").as(minName(c)),
                col(s"__rmax_${c}").as(maxName(c)))
              else Seq(
                least(col(minName(c)), col(s"__dmin_${c}")).as(minName(c)),
                greatest(col(maxName(c)), col(s"__dmax_${c}")).as(maxName(c)))) ++
            m.distinctCols.map(c =>
              if (needRepair) col(s"__rhll_${c}").as(hllName(c))
              else {
                // union of the old and delta sketches; either side may
                // be null (brand-new group / no inserted values)
                val old = col(hllName(c)); val dl = col(s"__dhll_${c}")
                when(old.isNull, dl).when(dl.isNull, old)
                  .otherwise(hll_union(old, dl)).as(hllName(c))
              }): _*)
        .persist()
      try {
        val updates = merged.filter(col("n") > 0L)
        val deletes = merged.filter(col("n") === 0L)
          .select(groupCols.map(col): _*)
        // touched = updates + deletes, which merge's fused validation
        // aggregate already counted — no separate count job
        val report = Maintenance.merge(spark, viewDir, updates, deletes)
        writeMeta(spark, viewDir,
          m.copy(baseVersion = cur, baseMetaHash = curHash))
        report.upsertRows + report.deleteRows
      } finally { merged.unpersist(); () }
    } finally { delta.unpersist(); () }
  }
}
