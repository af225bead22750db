package graft.operators

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{DivisionRouter, FileOrdinal, FileOrdinalExpr, GraftFs,
  PDataset, ScatterWrite, Sidecar, Stats}

/** Merge-on-read deletes (deletion vectors): mark rows deleted by
  * (file, row position) in a `_graft_dv/` overlay instead of
  * rewriting the data files — the Delta/Iceberg-v2 pattern that makes
  * a scattered GDPR erasure over a 100 TB table a metadata-sized
  * write instead of a one-file-per-hit rewrite.
  *
  *   - [[deleteKeys]] routes the key list to its partitions (same
  *     O(log n) division router as keyed maintenance), scans ONLY the
  *     affected files with parquet row positions, and appends the hit
  *     positions as a small parquet commit under `_graft_dv/`. Zero
  *     data files are touched.
  *   - [[scan]] is the merge-on-read read: the dataset anti-joined
  *     against the broadcast deletion vectors on (file, position).
  *     `spark.read.format("graft")` applies pending vectors
  *     TRANSPARENTLY (SQL readers never see deleted rows;
  *     `option("ignoreDeletionVectors", true)` opts back into the
  *     base). The engine-native `PDataset.scanParquet` stays the raw
  *     base read — maintenance internals depend on it.
  *   - [[materialize]] folds the vectors in: affected files are
  *     rewritten without their marked rows in ONE sidecar commit
  *     (untouched files never move), and the overlay is removed.
  *
  * Soundness: rewriting maintenance ops (upsert / delete / merge /
  * compact / restore / dropColumns) REFUSE while vectors exist —
  * their file rewrites would resurrect marked rows (positions bind to
  * file content). Call [[materialize]] first; metadata-only
  * `addColumns` and `vacuum` stay allowed. The scale contract:
  * vectors hold the DELETED row positions only, so the broadcast is
  * proportional to pending deletes, not table size — materialize
  * when it grows past broadcast comfort.
  *
  * Composition with views and the change feed: marking changes no
  * generation, so incremental views stay fresh and keep summarizing
  * the BASE table (the overlay is an explicit read path).
  * `materialize(retain = true)` archives the outgoing generation like
  * any retained mutation — the change feed then carries the marked
  * rows as deletes and [[IncrementalAgg.refresh]] absorbs them
  * normally.
  */
object DeletionVectors {

  val DvDirName = "_graft_dv"

  final case class Report(marked: Long, affectedFiles: Int)

  private def dvDir(dirPath: HPath): HPath = new HPath(dirPath, DvDirName)

  /** Whether any deletion vectors are pending. */
  def exists(spark: SparkSession, dir: String): Boolean = {
    val (fs, dirPath) = GraftFs.resolve(spark, dir)
    GraftFs.listStatuses(fs, dvDir(dirPath)).nonEmpty
  }

  /** Guard for rewriting maintenance ops. */
  private[operators] def requireNone(
      spark: SparkSession, dir: String, op: String): Unit =
    if (exists(spark, dir)) throw new IllegalStateException(
      s"$op would rewrite files that carry pending deletion vectors " +
        s"(positions bind to file content, so the rewrite would " +
        s"resurrect deleted rows): run DeletionVectors.materialize on " +
        s"$dir first — in SQL, `OPTIMIZE <table> TARGET <n> ROWS` " +
        "materializes pending deletes before compacting")

  /** The pending overlay rows `(file, pos)` for rewriting ops that
    * FOLD affected files' vectors into their rewrite instead of
    * refusing ([[Maintenance.updateWhere]] / `replaceWhere` / keyed
    * merges) — the scan drops the marked rows, the commit clears
    * exactly those files' entries via [[dropEntriesForFiles]]. */
  private[operators] def pending(
      spark: SparkSession, dir: String): Option[DataFrame] = {
    val (_, dirPath) = GraftFs.resolve(spark, dir)
    loadDv(spark, dirPath)
  }

  /** Drop `df`'s rows that the overlay marks deleted; `df` must still
    * expose the file `_metadata` (read the files directly, before any
    * projection that hides it). Broadcast ∝ pending marks. */
  private[operators] def minus(df: DataFrame, dv: DataFrame): DataFrame =
    df.withColumn("__dvf", fileNameOf(col("_metadata.file_path")))
      .withColumn("__dvp", col("_metadata.row_index"))
      .join(broadcast(dv),
        col("__dvf") === dv("file") && col("__dvp") === dv("pos"),
        "left_anti")
      .drop("__dvf", "__dvp")

  /** Remove the overlay entries of `files` (names a rewrite just
    * replaced — their marks are now folded into the new files): the
    * surviving entries land as ONE fresh commit, then the old commit
    * dirs delete. A crash between the steps only duplicates surviving
    * entries (the scan distincts) or leaves entries naming dead files
    * (which never match a scan again) — never resurrects a row. */
  private[operators] def dropEntriesForFiles(
      spark: SparkSession, dir: String, files: Set[String]): Unit = {
    if (files.isEmpty) return
    val (fs, dirPath) = GraftFs.resolve(spark, dir)
    val commits = GraftFs.listStatuses(fs, dvDir(dirPath))
      .filter(_.isDirectory).map(_.getPath)
    if (commits.isEmpty) return
    // anti-join, not an IN literal: a wide rewrite can clear 10^4+
    // files' entries in one commit
    import spark.implicits._
    val dv = spark.read.parquet(commits.map(_.toString): _*)
      .join(files.toSeq.toDF("file"), Seq("file"), "left_anti")
      .distinct().persist()
    try {
      if (dv.isEmpty) { GraftFs.deleteRecursive(fs, dvDir(dirPath)); () }
      else {
        val commit = new HPath(dvDir(dirPath),
          s"dv-${System.currentTimeMillis()}-${java.util.UUID.randomUUID()}")
        dv.write.option("compression", "zstd").parquet(commit.toString)
        commits.foreach(c => GraftFs.deleteRecursive(fs, c))
      }
    } finally { dv.unpersist(); () }
  }

  private def loadDv(
      spark: SparkSession, dirPath: HPath): Option[DataFrame] = {
    val (fs, _) = GraftFs.resolve(spark, dirPath.toString)
    val commits = GraftFs.listStatuses(fs, dvDir(dirPath))
      .filter(_.isDirectory).map(_.getPath.toString)
    if (commits.isEmpty) None
    // duplicates across commits are harmless for the anti join;
    // distinct keeps the broadcast minimal
    else Some(spark.read.parquet(commits: _*).distinct())
  }

  private def fileNameOf(c: org.apache.spark.sql.Column) =
    element_at(split(c, "/"), -1)

  /** Sidecar file pruning for [[deleteWhere]]: the SAME
    * [[org.apache.spark.sql.GraftFileIndex]] walk the read path uses,
    * so the delete side prunes exactly as well as a read with the
    * same predicate — full lex-tuple bounds on every index column
    * (equality prefixes unlock deeper columns: `k1 = x AND k2
    * BETWEEN a AND b` prunes by both), independent
    * `_graft_colstats.json` ranges on non-index columns, per-value
    * IN handling, and `_graft_bloom` point-lookup filters. The
    * predicate is resolved/coerced against the table schema first (a
    * bare `lit(5)` against a BIGINT column gets the cast the read
    * path's pushed filters have), and anything not provably prunable
    * keeps the file — [[org.apache.spark.sql.GraftFileIndex]] is
    * conservative by construction. */
  private[operators] def pruneByPredicate(
      spark: SparkSession,
      dirPath: HPath,
      m: Sidecar.Meta,
      predicate: org.apache.spark.sql.Column): IndexedSeq[Int] = {
    if (m.files.isEmpty) return IndexedSeq.empty
    // Resolve + type-coerce the predicate the way analysis would for
    // a real read (over a zero-row frame — driver-only, no job).
    val cond = org.apache.spark.sql.GraftBridge.analyzedCondition(
      spark, m.schema, predicate)
    val files = m.files.map(f => new HPath(dirPath, f).toString)
    val raw = graft.core.ColumnStats.rawForFiles(spark, files, m.schema)
    val index = new org.apache.spark.sql.GraftFileIndex(
      files.map(f => (new HPath(f), 0L)),
      m.indexColumns, m.lowerBounds, m.upperBounds,
      blooms = graft.core.BloomIndex.forFiles(spark, files),
      extraStats = graft.core.ColumnStats.pruning(raw))
    val kept = index.listFiles(Nil, Seq(cond))
      .flatMap(_.files.map(_.getPath.getName)).toSet
    m.files.indices.filter(i => kept(m.files(i)))
  }

  /** Mark every stored row whose index-tuple key appears in `keys` as
    * deleted — no data file is rewritten. Returns the number of
    * marked row positions and how many files they live in. */
  def deleteKeys(
      spark: SparkSession, dir: String, keys: DataFrame): Report = {
    val m = Sidecar.load(spark, dir)
    val (fs, dirPath) = GraftFs.resolve(spark, dir)
    require(m.indexColumns.nonEmpty,
      "deletion vectors need index columns; reindex first")
    val keyCols = m.indexColumns.toSeq
    require(keyCols.forall(keys.columns.contains),
      s"delete keys must carry the index columns ${keyCols.mkString(", ")}")
    val k = keys.select(keyCols.map(col): _*).distinct().persist()
    try {
      require(k.filter(keyCols.map(col(_).isNull).reduce(_ || _)).isEmpty,
        "delete keys must be non-null")
      // Route keys to partitions (bounds prune which files we scan).
      val routed =
        if (m.files.length == 1) k.withColumn("__part", lit(0))
        else k.withColumn("__part",
          DivisionRouter.route(keyCols.map(col), m.lowerBounds.drop(1)))
      val affected = routed.select("__part").distinct()
        .collect().map(_.getInt(0)).sorted
      if (affected.isEmpty) return Report(0L, 0)
      val paths = affected.map(p => new HPath(dirPath, m.files(p)).toString)
      // Row positions of the hits, from ONLY the affected files.
      val hits = m.readData(spark, paths.toIndexedSeq)
        .select((keyCols.map(col) :+
          fileNameOf(col("_metadata.file_path")).as("file") :+
          col("_metadata.row_index").as("pos")): _*)
        .join(k, keyCols, "left_semi")
        .select("file", "pos")
      val commit = new HPath(dvDir(dirPath),
        s"dv-${System.currentTimeMillis()}-${java.util.UUID.randomUUID()}")
      hits.write.option("compression", "zstd").parquet(commit.toString)
      val written = spark.read.parquet(commit.toString)
      val agg = written
        .agg(count(lit(1)).as("n"), count_distinct(col("file")).as("f"))
        .head()
      Report(agg.getLong(0), agg.getLong(1).toInt)
    } finally { k.unpersist(); () }
  }

  /** Mark every stored row matching `predicate` as deleted — no data
    * file is rewritten. Files the read path could prove predicate-free
    * are skipped before the scan ([[pruneByPredicate]] reuses the
    * read side's GraftFileIndex walk: lex bounds on every index
    * column, colstats ranges, blooms — at 100 TB the file listing
    * itself is the cost); within the surviving files the predicate
    * pushes down to the parquet scan (row-group pruning applies),
    * and only files that produce hits enter the overlay. */
  def deleteWhere(
      spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column): Report = {
    val m = Sidecar.load(spark, dir)
    val (_, dirPath) = GraftFs.resolve(spark, dir)
    val kept = pruneByPredicate(spark, dirPath, m, predicate)
    if (kept.isEmpty) return Report(0L, 0)
    val paths = kept.map(p => new HPath(dirPath, m.files(p)).toString)
    val hits = m.readData(spark, paths.toIndexedSeq)
      .withColumn("__file", fileNameOf(col("_metadata.file_path")))
      .withColumn("__pos", col("_metadata.row_index"))
      .filter(predicate)
      .select(col("__file").as("file"), col("__pos").as("pos"))
    val commit = new HPath(dvDir(dirPath),
      s"dv-${System.currentTimeMillis()}-${java.util.UUID.randomUUID()}")
    hits.write.option("compression", "zstd").parquet(commit.toString)
    val agg = spark.read.parquet(commit.toString)
      .agg(count(lit(1)).as("n"), count_distinct(col("file")).as("f"))
      .head()
    Report(agg.getLong(0), agg.getLong(1).toInt)
  }

  /** The merge-on-read scan: dataset rows minus every marked
    * position. With no pending vectors this is the plain scan. */
  def scan(spark: SparkSession, dir: String): DataFrame = {
    val (_, dirPath) = GraftFs.resolve(spark, dir)
    val base = PDataset.scanParquet(spark, dir).toDF
    loadDv(spark, dirPath) match {
      case None => base
      case Some(dv) =>
        base
          .withColumn("__file", fileNameOf(col("_metadata.file_path")))
          .withColumn("__pos", col("_metadata.row_index"))
          .join(broadcast(dv),
            col("__file") === dv("file") && col("__pos") === dv("pos"),
            "left_anti")
          .drop("__file", "__pos")
    }
  }

  /** Fold pending vectors into the data: rewrite ONLY the files that
    * carry marked rows (dropping those rows), swap the sidecar once,
    * and remove the overlay. `retain = true` archives the outgoing
    * generation like every maintenance op. */
  def materialize(
      spark: SparkSession, dir: String, retain: Boolean = false):
      Maintenance.Report = {
    val m = Sidecar.load(spark, dir)
    val (fs, dirPath) = GraftFs.resolve(spark, dir)
    val loadedFp = Maintenance.metaFingerprint(spark, dirPath)
    val dv = loadDv(spark, dirPath) match {
      case None => return Maintenance.Report(0, 0, 0, 0, m.files.length)
      case Some(d) => d.persist()
    }
    try {
      val affectedNames = dv.select("file").distinct()
        .collect().map(_.getString(0)).toSet
      val affected = m.files.indices
        .filter(p => affectedNames(m.files(p))).toArray
      def pathOf(p: Int): String = new HPath(dirPath, m.files(p)).toString
      val newNameOf: Map[Int, String] = affected.zipWithIndex.map {
        case (p, j) => p -> Sidecar.partitionFileName(
          m.maxPartitionIndex + 1 + j)
      }.toMap
      // input_file_name() cannot sit above the anti join (multi
      // source); the carried full metadata path routes instead.
      val partOf = new FileOrdinal(affected.map(p =>
        Stats.normalizePath(pathOf(p)) -> p).toMap)
      val kept = m.readData(spark, affected.map(pathOf).toIndexedSeq)
        .withColumn("__path", col("_metadata.file_path"))
        .withColumn("__file", fileNameOf(col("__path")))
        .withColumn("__pos", col("_metadata.row_index"))
        .join(broadcast(dv),
          col("__file") === dv("file") && col("__pos") === dv("pos"),
          "left_anti")
        .withColumn("__part", FileOrdinalExpr.ordinal(col("__path"), partOf))
        .drop("__path", "__file", "__pos")
      val stage = GraftFs.mkStageDir(fs,
        Option(dirPath.getParent).getOrElse(dirPath), ".graft-dvmat-")
      val written =
        try ScatterWrite.partFiles(spark, kept, m.files.length, fs,
          dirPath, stage, i => newNameOf(i),
          orderCols = m.indexColumns.toSeq, dropOrderCols = false,
          renames = m.columnRenames)
        finally GraftFs.deleteRecursive(fs, stage)
      val writtenSet = written.map(_._1).toSet
      val statsByPath =
        if (writtenSet.isEmpty) Map.empty[String, Stats.PartStats]
        else Stats.forFiles(spark,
          affected.filter(writtenSet)
            .map(p => new HPath(dirPath, newNameOf(p)).toString)
            .toIndexedSeq,
          m.indexColumns.map(m.physicalName), Some(m.physicalSchema))
      val affectedSet = affected.toSet
      val entries = m.files.indices.flatMap { p =>
        if (!affectedSet(p))
          Some((m.files(p), m.sizes(p), m.lowerBounds(p), m.upperBounds(p)))
        else if (writtenSet(p)) {
          val st = statsByPath(Stats.normalizePath(
            new HPath(dirPath, newNameOf(p)).toString))
          Some((newNameOf(p), st.size, st.lb, st.ub))
        } else None // every row of the file was marked: drop it
      }
      Maintenance.guardUnchanged(spark, dirPath, loadedFp)
      if (retain) Maintenance.archiveCurrent(spark, fs, dirPath)
      Sidecar.write(spark, dir, m.indexColumns, entries.map(_._1),
        entries.map(_._2), entries.map(_._3), entries.map(_._4),
        m.maxPartitionIndex + affected.length, m.schema,
        extras = m.extras)
      if (!retain)
        Maintenance.deletableNow(spark, dir, affected.map(m.files).toSeq)
          .foreach(f => fs.delete(new HPath(dirPath, f), false))
      GraftFs.deleteRecursive(fs, dvDir(dirPath))
      // the rewritten files got fresh names: extend the Bloom /
      // column-stats sidecars to them like every maintenance op
      Maintenance.refreshBloom(spark, dir)
      Maintenance.Report(rewritten = written.length,
        dropped = affected.length - written.length, merged = 0,
        created = written.length,
        untouched = m.files.length - affected.length)
    } finally { dv.unpersist(); () }
  }
}
