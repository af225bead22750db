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
        s"$dir first")

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

  /** Conservative sidecar file pruning for [[deleteWhere]]: comparison
    * conjuncts on the FIRST index column (the clustered column — the
    * common shape) intersect with each file's first-column [lb, ub]
    * from the sidecar, and conjuncts on any `_graft_colstats.json`
    * column intersect with that file's recorded independent range —
    * so a range-bounded predicate scans only the overlapping files
    * instead of the whole table. Anything not provably prunable keeps
    * the file: unrelated conjuncts derive nothing, OR short-circuits
    * to "keep all", a stats-less file has no range (keep), and a type
    * mismatch between a literal and a stored bound falls back to keep
    * (the later parquet scan still row-group-prunes). Both range
    * sources share the null-first encoding: lb None = nulls present
    * (least non-null unknown), ub None = all-null (no comparison can
    * match — prune). */
  private[operators] def pruneByPredicate(
      m: Sidecar.Meta,
      pred: org.apache.spark.sql.catalyst.expressions.Expression,
      stats: graft.core.ColumnStats.Stats = Map.empty):
      IndexedSeq[Int] = {
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    val all = m.files.indices
    // Per prunable column (lowercased): file -> its known (lb, ub),
    // or None when the file carries no range for it. The index column
    // wins a name collision with a stats column.
    val rangeOf: Map[String, Int => Option[(Option[Any], Option[Any])]] = {
      val st = stats.map { case (c, per) =>
        c.toLowerCase -> ((p: Int) => per(p))
      }
      val idx = m.indexColumns.headOption.map { c =>
        c.toLowerCase -> ((p: Int) => Some((
          m.lowerBounds(p).headOption.flatten,
          m.upperBounds(p).headOption.flatten)): Option[(Option[Any],
            Option[Any])])
      }
      st ++ idx
    }
    if (rangeOf.isEmpty) return all
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        Some(a.nameParts.head.toLowerCase)
      case a: AttributeReference => Some(a.name.toLowerCase)
      case _ => None
    }
    def litVal(e: Expression): Option[Any] = e match {
      case l: Literal if l.value != null => scala.util.Try(
        CatalystTypeConverters.createToScalaConverter(l.dataType)(l.value))
        .toOption
      case _ => None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    // per column: (value, inclusive) constraints its values must meet
    val lowers = scala.collection.mutable.Map
      .empty[String, List[(Any, Boolean)]].withDefaultValue(Nil)
    val uppers = scala.collection.mutable.Map
      .empty[String, List[(Any, Boolean)]].withDefaultValue(Nil)
    def harvest(a: Expression, v: Expression,
        lo: Option[Boolean], hi: Option[Boolean]): Unit =
      attrName(a).filter(rangeOf.contains).foreach { c =>
        litVal(v).foreach { value =>
          lo.foreach(inc => lowers(c) = (value, inc) :: lowers(c))
          hi.foreach(inc => uppers(c) = (value, inc) :: uppers(c))
        }
      }
    // Each comparison harvests both directions: harvest() is a no-op
    // unless its first argument is a prunable column and its second
    // a literal, so `attr > lit` yields a lower bound and `lit > attr`
    // an upper bound from the same case.
    conjuncts(pred).foreach {
      case GreaterThan(l, r) =>
        harvest(l, r, Some(false), None); harvest(r, l, None, Some(false))
      case GreaterThanOrEqual(l, r) =>
        harvest(l, r, Some(true), None); harvest(r, l, None, Some(true))
      case LessThan(l, r) =>
        harvest(l, r, None, Some(false)); harvest(r, l, Some(false), None)
      case LessThanOrEqual(l, r) =>
        harvest(l, r, None, Some(true)); harvest(r, l, Some(true), None)
      case EqualTo(l, r) =>
        harvest(l, r, Some(true), Some(true))
        harvest(r, l, Some(true), Some(true))
      // IN-list: its convex hull [min, max] is a sound interval (any
      // matching row equals some non-null element, so it lies within
      // the hull); null elements never match and drop out. The
      // classic clustered-erasure shape `WHERE k IN (...)` then scans
      // only the covering files.
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        attrName(a).filter(rangeOf.contains).foreach { c =>
          val nonNull = vs.collect { case l: Literal if l.value != null => l }
          val vals = nonNull.flatMap(litVal)
          // every non-null element must convert, or the hull is not a
          // proven cover; null elements never match and drop out
          if (vals.nonEmpty && vals.length == nonNull.length)
            scala.util.Try(
              vals.sortWith(graft.core.Lex.valueCmp(_, _) < 0)).foreach {
              sv =>
                lowers(c) = (sv.head, true) :: lowers(c)
                uppers(c) = (sv.last, true) :: uppers(c)
            }
        }
      case _ => ()
    }
    val constrained = (lowers.keySet ++ uppers.keySet).toSeq.sorted
    if (constrained.isEmpty) return all
    all.filter { p =>
      constrained.forall { c =>
        rangeOf(c)(p) match {
          case None => true // no range recorded for this file: keep
          case Some((flo, fhi)) =>
            val aboveLowers = lowers(c).forall { case (v, inc) =>
              fhi.exists(x => scala.util.Try(graft.core.Lex.valueCmp(x, v))
                .map(cc => if (inc) cc >= 0 else cc > 0).getOrElse(true))
            }
            val belowUppers = uppers(c).forall { case (v, inc) =>
              // flo None (nulls present) never proves the file above v
              flo.forall(x => scala.util.Try(graft.core.Lex.valueCmp(x, v))
                .map(cc => if (inc) cc <= 0 else cc < 0).getOrElse(true))
            }
            // fhi None with a comparison present: all values NULL, no
            // comparison can match — prune.
            fhi.nonEmpty && aboveLowers && belowUppers
        }
      }
    }
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
      val hits = spark.read.schema(m.schema)
        .parquet(paths.toIndexedSeq: _*)
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
    * file is rewritten. Files whose sidecar bounds cannot overlap a
    * comparison on the first index column are skipped before the scan
    * ([[pruneByPredicate]] — at 100 TB the file listing itself is the
    * cost); within the surviving files the predicate pushes down to
    * the parquet scan (row-group pruning applies), and only files
    * that produce hits enter the overlay. */
  def deleteWhere(
      spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column): Report = {
    val m = Sidecar.load(spark, dir)
    val (_, dirPath) = GraftFs.resolve(spark, dir)
    val stats = graft.core.ColumnStats.forFiles(spark,
      m.files.map(f => new HPath(dirPath, f).toString), m.schema)
    val kept = pruneByPredicate(m,
      org.apache.spark.sql.GraftBridge.toExpression(predicate), stats)
    if (kept.isEmpty) return Report(0L, 0)
    val paths = kept.map(p => new HPath(dirPath, m.files(p)).toString)
    val hits = spark.read.schema(m.schema)
      .parquet(paths.toIndexedSeq: _*)
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
      val kept = spark.read.schema(m.schema)
        .parquet(affected.map(pathOf).toIndexedSeq: _*)
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
          orderCols = m.indexColumns.toSeq, dropOrderCols = false)
        finally GraftFs.deleteRecursive(fs, stage)
      val writtenSet = written.map(_._1).toSet
      val statsByPath =
        if (writtenSet.isEmpty) Map.empty[String, Stats.PartStats]
        else Stats.forFiles(spark,
          affected.filter(writtenSet)
            .map(p => new HPath(dirPath, newNameOf(p)).toString)
            .toIndexedSeq,
          m.indexColumns, Some(m.schema))
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
        m.maxPartitionIndex + affected.length, m.schema)
      if (!retain)
        affected.foreach(p => fs.delete(new HPath(dirPath, m.files(p)), false))
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
