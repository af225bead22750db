package graft.core

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-file min/max/null-count statistics for NON-index columns — the
  * Delta/Iceberg column-stats pattern, as an optional `_graft_colstats
  * .json` sidecar next to the data (KB-scale: #files × #columns
  * scalar pairs). The sidecar's lex-tuple bounds prune on the index
  * columns and `_graft_bloom` handles point lookups; this closes the
  * remaining gap — RANGE predicates on any other stats-tracked column
  * prune whole files at plan time through [[org.apache.spark.sql
  * .GraftFileIndex]]'s independent-range path (`spark.read
  * .format("graft")` picks the sidecar up automatically, like Bloom).
  *
  * Soundness under maintenance: entries are keyed by file NAME and
  * every rewrite allocates fresh names, so a stale entry can never
  * describe new content — a file without an entry is simply
  * unprunable until [[update]] stats it (one pass over ONLY the
  * missing files). Maintenance ops refresh the sidecar the same way
  * they extend Bloom filters.
  *
  * Null encoding matches the independent-stats ColRange semantics
  * (null-first order, [[graft.operators.Layout]] uses the same): a
  * file with any null in the column records lb = null-extreme (its
  * least NON-null value is unknown to comparisons), and an all-null
  * column records ub = null-extreme (no comparison can match).
  */
object ColumnStats {

  val FileName = "_graft_colstats.json"

  /** Per column name: per file (aligned with the caller's file list)
    * an optional (lb, ub) independent range; None = no entry (keep). */
  type Stats = Map[String, IndexedSeq[Option[(Option[Any], Option[Any])]]]

  /** One file's raw stats for one column: min/max over the NON-null
    * values (None when every row is null), the exact null count, and
    * — for integral columns — the exact sum (outer None = not
    * recorded, e.g. a non-integral column, a pre-sum stats file, or a
    * file whose per-file sum overflowed Long; inner None = all rows
    * null, the SQL sum of nothing). `sumExact` is true only for sums
    * recorded by a try_sum-based build (never wrapped, any eval
    * mode); sums from older builds may have wrapped under a LEGACY
    * session, so an ANSI read must not fold them. Unlike [[Stats]]
    * this keeps the non-null minimum of a null-carrying file, so
    * metadata-only min/max/count(col)/sum(col) aggregates can answer
    * exactly. */
  final case class FileColStats(
      min: Option[Any], max: Option[Any], nulls: Long,
      sum: Option[Option[Long]], sumExact: Boolean = false)

  /** Per column name: one optional raw entry per file. */
  type Raw = Map[String, IndexedSeq[Option[FileColStats]]]

  private def statsPath(spark: SparkSession, dir: String): HPath = {
    val (_, dirPath) = GraftFs.resolve(spark, dir)
    new HPath(dirPath, FileName)
  }

  def exists(spark: SparkSession, dir: String): Boolean = {
    val (fs, _) = GraftFs.resolve(spark, dir)
    GraftFs.statusOf(fs, statsPath(spark, dir)).exists(_.isFile)
  }

  /** Comparison-prunable and JSON-roundtrippable column types. */
  private[graft] def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | StringType | DateType | TimestampType |
        TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Record min/max/null stats for `cols` over every file in the
    * table's sidecar listing — ONE narrow aggregation pass (reads only
    * `cols`), #files result rows on the driver. Replaces any existing
    * stats sidecar (columns are re-chosen, not merged). */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "column stats need at least one column")
    val m = Sidecar.load(spark, dir)
    cols.foreach { c =>
      val f = m.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"stats option: no such column $c"))
      require(supported(f.dataType),
        "stats option: supports numeric, string, date and timestamp " +
          s"columns; $c is ${f.dataType.simpleString}")
    }
    val (_, dirPath) = GraftFs.resolve(spark, dir)
    val entries = fileEntries(spark,
      m.files.map(f => new HPath(dirPath, f).toString), cols, m)
    save(spark, dir, cols, entries)
  }

  /** Extend the recorded stats to files the sidecar lists but the
    * stats file does not (appends, maintenance rewrites) — one pass
    * over ONLY those files — and drop entries for files no longer
    * listed. No-op without a stats sidecar. */
  def update(spark: SparkSession, dir: String): Unit = {
    if (!exists(spark, dir)) return
    val (_, cols, recorded) = loadSafe(spark, dir).getOrElse {
      // a corrupt stats sidecar (e.g. written by a pre-$float build
      // over NaN data) is derived metadata: self-heal by deleting it
      // rather than failing every later maintenance op
      val (fs, _) = GraftFs.resolve(spark, dir)
      fs.delete(statsPath(spark, dir), false)
      return
    }
    val m = Sidecar.load(spark, dir)
    // base-name identity: a shallow clone's entries are absolute
    // paths into its source, recorded stats key by base name
    val listed = m.files.map(GraftFs.baseName).toSet
    val kept = recorded.filter(e => listed(e("name").toString))
    val have = kept.map(_("name").toString).toSet
    val missing = m.files.filterNot(f => have(GraftFs.baseName(f)))
    val (_, dirPath) = GraftFs.resolve(spark, dir)
    val fresh = fileEntries(spark,
      missing.map(f => new HPath(dirPath, f).toString), cols, m)
    save(spark, dir, cols, (kept ++ fresh).sortBy(_("name").toString))
  }

  /** Remove dropped columns' entries from the stats sidecar (schema
    * evolution): a stale entry would describe a later re-added
    * column's OLD data — an IS NULL prune could then wrongly drop
    * files whose re-added column is all null — and a later [[update]]
    * would fail statting a ghost column. Deletes the sidecar when no
    * recorded column survives. */
  /** Re-key the recorded column list for a metadata-only column
    * rename — driver-side sidecar rewrite, stats untouched. */
  def renameColumnEntries(
      spark: SparkSession, dir: String,
      renames: Map[String, String]): Unit = {
    if (!exists(spark, dir)) return
    val (_, recorded, entries) = loadSafe(spark, dir).getOrElse(return)
    val rekeyed = recorded.map(c => renames.getOrElse(c, c))
    if (rekeyed != recorded) save(spark, dir, rekeyed, entries)
  }

  def dropColumnEntries(
      spark: SparkSession, dir: String, cols: Set[String]): Unit = {
    if (!exists(spark, dir)) return
    val (_, recorded, entries) = loadSafe(spark, dir).getOrElse {
      val (fs, _) = GraftFs.resolve(spark, dir)
      fs.delete(statsPath(spark, dir), false)
      return
    }
    val keepIdx = recorded.zipWithIndex.filterNot(kv => cols(kv._1))
    if (keepIdx.length == recorded.length) return
    val (fs, _) = GraftFs.resolve(spark, dir)
    if (keepIdx.isEmpty) { fs.delete(statsPath(spark, dir), false); () }
    else save(spark, dir, keepIdx.map(_._1), entries.map { e =>
      val per = e("stats").asInstanceOf[Seq[Any]]
      e + ("stats" -> keepIdx.map(kv => per(kv._2)))
    })
  }

  /** The stats for `files` (full paths, one shared parent dir),
    * aligned per file — the read-side hook [[org.apache.spark.sql
    * .GraftRelations]] calls when planning a graft relation. Empty
    * when no stats sidecar exists. Cached on (dir, mtime, len) like
    * the Bloom sidecar. */
  def forFiles(
      spark: SparkSession, files: Seq[String],
      schema: StructType): Stats =
    pruning(rawForFiles(spark, files, schema))

  /** Raw stats folded to the pruning encoding: a null-carrying file's
    * least value is the null extreme (lb None); an all-null column
    * has ub None. */
  def pruning(raw: Raw): Stats =
    raw.map { case (c, per) =>
      c -> per.map(_.map(s =>
        (if (s.nulls > 0L) None else s.min, s.max)))
    }

  /** The raw (min, max, nulls) stats for `files` (full paths, one
    * shared parent dir), aligned per file. Empty when no stats
    * sidecar exists. Cached on (dir, mtime, len) like the Bloom
    * sidecar. */
  def rawForFiles(
      spark: SparkSession, files: Seq[String],
      schema: StructType): Raw = rawForFiles(spark, files, schema, None)

  /** Entries are keyed by file BASE name, so when the caller knows
    * the TABLE directory it may pass it as `sidecarDir` — required
    * for a shallow clone, whose listed files live in the SOURCE
    * directory (possibly several, once it diverges) while its own
    * stats sidecar sits in the clone's dir. Without it the sidecar
    * location falls back to the files' single shared parent (and
    * mixed parents degrade to no pruning — safe, never wrong). */
  def rawForFiles(
      spark: SparkSession, files: Seq[String],
      schema: StructType, sidecarDir: Option[String]): Raw = {
    if (files.isEmpty) return Map.empty
    val dir = sidecarDir.getOrElse {
      val parents = files.map(f =>
        Option(new HPath(f).getParent).map(_.toString).getOrElse(""))
        .distinct
      if (parents.length != 1) return Map.empty
      parents.head
    }
    val (fs, _) = GraftFs.resolve(spark, dir)
    val status = GraftFs.statusOf(fs, statsPath(spark, dir))
      .getOrElse(return Map.empty)
    if (!status.isFile) return Map.empty
    val key = (dir, status.getModificationTime, status.getLen)
    val (ver, cols, entries) = cached(spark, dir, key)
      .getOrElse(return Map.empty) // corrupt sidecar: degrade to no stats
    val byName = entries.map(e => e("name").toString -> e).toMap
    val names = files.map(f => new HPath(f).getName).toIndexedSeq
    cols.zipWithIndex.map { case (c, ci) =>
      val dt = schema.fields.find(_.name == c).map(_.dataType)
      // decimals in pre-v2 sidecars round-tripped through Double — a
      // >15-significant-digit bound may have shifted, so treat the
      // column as having no entries (unprunable, folds decline)
      // rather than prune/answer from a possibly-shifted value
      if (ver < 2 && dt.exists(_.isInstanceOf[DecimalType]))
        c -> names.map(_ => None)
      else c -> names.map { n =>
        for {
          e <- byName.get(n)
          t <- dt
        } yield rawOf(e, ci, t)
      }
    }.toMap
  }

  /** LRU-cached sidecar parse keyed on (dir, mtime, len); None = the
    * sidecar failed to parse (reads degrade to "no stats" instead of
    * failing — the next maintenance op's [[update]] deletes it). */
  private def cached(
      spark: SparkSession, dir: String, key: (String, Long, Long)):
      Option[(Long, Seq[String], Seq[Map[String, Any]])] =
    cache.synchronized {
      Option(cache.get(key)).orElse {
        cacheLoads.incrementAndGet()
        try {
          val v = load(spark, dir)
          cache.put(key, v)
          Some(v)
        } catch {
          case scala.util.control.NonFatal(e) =>
            log.warn(s"ignoring unreadable column-stats sidecar in " +
              s"$dir: ${e.getMessage}")
            None
        }
      }
    }

  /** The raw stats of column `ci` in one decoded file entry. */
  private def rawOf(
      e: Map[String, Any], ci: Int, dt: DataType): FileColStats = {
    val s = e("stats").asInstanceOf[Seq[Any]](ci)
      .asInstanceOf[Map[String, Any]]
    FileColStats(
      Option(s("min")).map(Sidecar.coerce(_, dt)),
      Option(s("max")).map(Sidecar.coerce(_, dt)),
      s("nulls").asInstanceOf[Long],
      // "sum" present (possibly null = all-null file) only for
      // integral columns written by sum-aware builds
      s.get("sum").map(v => Option(v).map(_.asInstanceOf[Long])),
      s.get("sumx").contains(true))
  }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** One narrow stats pass over just `files`: per file, per column
    * (min, max, nulls[, sum]) — same shape [[graft.operators.Layout]]
    * records for z-order layouts, plus the exact per-file sum for
    * integral columns (long addition is associative even when it
    * wraps, so a driver-side fold of per-file sums is bit-identical
    * to the engine's own sum — recorded so metadata-only `sum(col)`
    * can answer without reading a file). Sums go through `try_sum`
    * (null-on-overflow in EVERY eval mode), so a recorded sum never
    * wrapped — it is exact ("sumx") — and one pathological >2^63
    * file degrades to "sum unrecorded" for that file instead of
    * killing the whole build under ANSI. */
  private[graft] def fileEntries(
      spark: SparkSession, files: Seq[String], cols: Seq[String],
      m: Sidecar.Meta): Seq[Map[String, Any]] = {
    if (files.isEmpty) return Seq.empty
    val schema = m.schema
    val summed = cols.map(c =>
      schema.fields.find(_.name == c).exists(f => integral(f.dataType)))
    val aggs = cols.zip(summed).flatMap { case (c, withSum) =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (withSum) try_sum(col(c).cast("long")) else lit(null))
          .as(s"__sum_$c"))
    }
    val statted = m.readData(spark, files)
      .groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        val per = cols.indices.map { i =>
          val mn = r.get(1 + i * 4)
          val base = Map[String, Any](
            "min" -> mn, "max" -> r.get(2 + i * 4),
            "nulls" -> r.getLong(3 + i * 4))
          if (!summed(i)) base
          else {
            val sm = r.get(4 + i * 4)
            // try_sum null with non-null rows present = overflow:
            // omit the sum (metadata sum declines for the table)
            // rather than record a wrapped value
            if (sm == null && mn != null) base
            else base ++ Map[String, Any]("sum" -> sm, "sumx" -> true)
          }
        }
        Map[String, Any](
          "name" -> new HPath(r.getString(0)).getName, "stats" -> per)
      }.toSeq
    // a zero-row parquet file produces no aggregation row: emit an
    // explicit empty entry (min=max=null, nulls=0 — prunes every
    // comparison AND every IS NULL, which is vacuously sound) so
    // stats coverage is complete and update() stops re-submitting a
    // stats job for it on every later maintenance op
    val have = statted.map(_("name").toString).toSet
    val empties = files.map(f => new HPath(f).getName)
      .filterNot(have).map { n =>
        Map[String, Any]("name" -> n, "stats" -> cols.indices.map { i =>
          val base = Map[String, Any](
            "min" -> null, "max" -> null, "nulls" -> 0L)
          if (summed(i))
            base ++ Map[String, Any]("sum" -> null, "sumx" -> true)
          else base
        })
      }
    (statted ++ empties).sortBy(_("name").toString)
  }

  /** Codec version 2: non-finite doubles as `{"$float": ...}`,
    * decimals as exact `{"$decimal": ...}` strings, try_sum-exact
    * sums ("sumx"), zero-row-file entries. Pre-v2 sidecars (no "v"
    * key) decode but their DecimalType columns are treated as
    * entry-less on read. */
  private val CodecVersion = 2L

  private def save(
      spark: SparkSession, dir: String, cols: Seq[String],
      entries: Seq[Map[String, Any]]): Unit = {
    val (fs, _) = GraftFs.resolve(spark, dir)
    GraftFs.writeString(fs, statsPath(spark, dir), TypedJson.write(
      scala.collection.immutable.ListMap(
        "v" -> CodecVersion, "cols" -> cols, "files" -> entries)))
  }

  private def load(
      spark: SparkSession, dir: String):
      (Long, Seq[String], Seq[Map[String, Any]]) = {
    val (fs, _) = GraftFs.resolve(spark, dir)
    val meta = TypedJson.parse(
      GraftFs.readString(fs, statsPath(spark, dir)))
      .asInstanceOf[Map[String, Any]]
    (meta.get("v").map(_.asInstanceOf[Long]).getOrElse(1L),
      meta("cols").asInstanceOf[Seq[Any]].map(_.toString),
      meta("files").asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[Map[String, Any]]))
  }

  private def loadSafe(
      spark: SparkSession, dir: String):
      Option[(Long, Seq[String], Seq[Map[String, Any]])] =
    try Some(load(spark, dir))
    catch {
      case scala.util.control.NonFatal(e) =>
        log.warn(s"ignoring unreadable column-stats sidecar in " +
          s"$dir: ${e.getMessage}")
        None
    }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Parse-once LRU over sidecars keyed on (dir, mtime, len) — many
    * tables read in one session each keep their slot instead of the
    * old clear-all-at-9 flush. Access-ordered; eldest evicted past
    * [[MaxCached]]. */
  private val MaxCached = 64
  private[graft] val cacheLoads =
    new java.util.concurrent.atomic.AtomicLong
  private val cache = new java.util.LinkedHashMap[
      (String, Long, Long), (Long, Seq[String], Seq[Map[String, Any]])](
      16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, Long, Long),
          (Long, Seq[String], Seq[Map[String, Any]])]): Boolean =
      size() > MaxCached
  }
}
