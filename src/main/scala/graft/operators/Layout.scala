package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, GraftRelations, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import graft.core.{DivisionRouter, GraftFs, Sidecar, TypedJson}
import graft.core.Lex.Bound

/** Multi-dimensional data layout: z-order (Morton) clustering plus a
  * stats-carrying reader, so range predicates on EVERY clustered
  * column prune files at plan time — the lakehouse `OPTIMIZE ZORDER
  * BY` idea (public Delta/Iceberg technique), built from this
  * engine's own parts.
  *
  * Why not lex sort: sorting by (a, b) gives perfect pruning on `a`
  * and none on `b` once `a` varies within a file. Interleaving
  * quantile-bucket bits of both columns bounds BOTH per file at
  * ~sqrt granularity — the right trade for two-sided range scans
  * over 100 TB.
  *
  * Scale shape: one pass for the quantile sketches (all columns in a
  * single `approxQuantile` job), one shuffle (range partition by
  * z-value), one narrow stats pass (per-file min/max, map-side
  * partial agg) whose result is #files rows on the driver. Bucketing
  * is an O(log buckets) binary search per row (the division router),
  * interleaving is constant unrolled shifts — the whole z projection
  * stays inside whole-stage codegen.
  *
  * The `_zorder_meta.json` sidecar stores the relation schema, the
  * quantile cut points and per-file per-column min/max/null stats, so
  * [[zorderRead]] plans with zero footer reads and [[zorderAppend]]
  * lands daily increments in the existing bucket space — clustering
  * stays effective across old and new files without rewriting the
  * table.
  */
object Layout {

  val MetaFile = "_zorder_meta.json"

  /** Per-column quantile cut points, one job for all columns.
    * `bits` bits per column means `2^bits - 1` interior cuts. */
  def quantileCuts(
      df: DataFrame,
      cols: Seq[String],
      bits: Int,
      relErr: Double = 1e-3): Seq[Array[Double]] = {
    require(bits >= 1 && bits * cols.length <= 62,
      s"bits=$bits over ${cols.length} columns exceeds one long")
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    df.stat.approxQuantile(cols.toArray, probs, relErr).toSeq
  }

  /** Bucket id in [0, cuts+1) via binary search over sorted cut
    * points (codegen — the division router with scalar bounds). */
  def bucketOf(c: Column, cuts: Array[Double]): Column = {
    val bounds = cuts.distinct.sorted.toIndexedSeq
      .map(v => Vector(Option(v)): Bound)
    DivisionRouter.route(Seq(c.cast("double")), bounds)
  }

  /** Morton-interleave the low `bits` of each bucket id: bit j of
    * column k lands at z bit `j * n + k`. Constant unrolled shifts. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.length
    val terms = for {
      (b, k) <- buckets.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(
      shiftrightunsigned(b.cast("long"), j).bitwiseAND(lit(1L)), j * n + k)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The z-value column for the given pre-computed cut points. */
  def zColumnFor(cols: Seq[String], cuts: Seq[Array[Double]], bits: Int): Column =
    interleave(
      cols.zip(cuts).map { case (c, cu) => bucketOf(col(c), cu) }, bits)

  /** The z-value column for `df` over `cols` (runs the one-pass
    * quantile job on `df` to place the cut points). */
  def zColumn(df: DataFrame, cols: Seq[String], bits: Int = 12): Column =
    zColumnFor(cols, quantileCuts(df, cols, bits), bits)

  /** Write `df` z-order-clustered on `cols` into ~`targetFiles`
    * files, then collect per-file per-column min/max/null stats (one
    * narrow pass, #files result rows) into a `_zorder_meta.json`
    * sidecar — together with the schema and the quantile cuts — for
    * [[zorderRead]]'s plan-time pruning and [[zorderAppend]]'s
    * incremental clustering. `df` is cached across the quantile and
    * shuffle passes so an expensive upstream pipeline runs once. */
  def zorderWrite(
      df: DataFrame,
      dir: String,
      cols: Seq[String],
      targetFiles: Int,
      bits: Int = 12): Unit = {
    val spark = df.sparkSession
    val cached = df.persist()
    try {
      val cuts = quantileCuts(cached, cols, bits)
      cached.withColumn("__z", zColumnFor(cols, cuts, bits))
        .repartitionByRange(targetFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(dir)
      val filesJson = fileStats(spark, listDataFiles(spark, dir), cols)
      val meta = Map(
        "cols" -> cols,
        "bits" -> bits,
        // nullable, like any file-relation schema: files written later
        // (or evolved) may omit a column, which then reads as null
        "schema" -> StructType(
          df.schema.fields.map(_.copy(nullable = true))).json,
        "cuts" -> cuts.map(_.toSeq),
        "files" -> filesJson)
      writeMeta(spark, dir, meta)
    } finally { cached.unpersist(); () }
  }

  /** Append `df` into an existing [[zorderWrite]] directory REUSING
    * the stored quantile cuts: new rows land in the same z-bucket
    * space, new files get their own stats rows in the sidecar, and
    * pruning stays effective across old and new files — daily ingest
    * without rewriting the table. (Cuts reflect the original value
    * distribution; out-of-range values clip to the edge buckets. Run
    * a fresh [[zorderWrite]] when drift makes buckets lopsided.) */
  def zorderAppend(
      df: DataFrame,
      dir: String,
      targetFiles: Int = 1): Unit = {
    val spark = df.sparkSession
    val meta = readMeta(spark, dir)
    val cols = meta("cols").asInstanceOf[Seq[Any]].map(_.toString)
    val bits = meta("bits").asInstanceOf[Long].toInt
    val cuts = meta("cuts").asInstanceOf[Seq[Any]].map(
      _.asInstanceOf[Seq[Any]].map {
        case d: Double => d
        case l: Long => l.toDouble
      }.toArray)
    val known = meta("files").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    val knownNames = known.map(_("name").toString).toSet
    df.withColumn("__z", zColumnFor(cols, cuts, bits))
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("append").parquet(dir)
    val newFiles = listDataFiles(spark, dir)
      .filterNot(p => knownNames.contains(p.getName))
    writeMeta(spark, dir,
      meta + ("files" -> (known ++ fileStats(spark, newFiles, cols))))
  }

  /** Open a [[zorderWrite]] directory as a relation whose schema AND
    * file listing are served from the stats sidecar (no footer reads
    * at plan time): pushed range/equality filters on any clustered
    * column prune whole files before the scan plans splits. */
  def zorderRead(spark: SparkSession, dir: String): DataFrame = {
    val meta = readMeta(spark, dir)
    val cols = meta("cols").asInstanceOf[Seq[Any]].map(_.toString)
    val fileEntries = meta("files").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    val files = fileEntries
      .map(f => new Path(dir, f("name").toString).toString).toIndexedSeq
    require(files.nonEmpty, s"no files recorded in $dir/$MetaFile")
    val schema =
      DataType.fromJson(meta("schema").toString).asInstanceOf[StructType]
    val dtOf = cols.map(c => c -> schema(c).dataType).toMap
    def boundsOf(f: Map[String, Any]): (Bound, Bound) = {
      val per = f("stats").asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[Map[String, Any]])
      val lb = cols.zip(per).map { case (c, s) =>
        // any null in the file -> least value is the null extreme
        if (s("nulls").asInstanceOf[Long] > 0L) None
        else Option(s("min")).map(Sidecar.coerce(_, dtOf(c)))
      }.toVector
      val ub = cols.zip(per).map { case (c, s) =>
        Option(s("max")).map(Sidecar.coerce(_, dtOf(c)))
      }.toVector
      (lb, ub)
    }
    val (lbs, ubs) = fileEntries.map(boundsOf).unzip
    GraftRelations.independentStatsParquetDF(
      spark, files, schema, cols,
      lbs.toIndexedSeq, ubs.toIndexedSeq)
  }

  /** Parquet data files of `dir` (sorted; `_`-prefixed and hidden
    * files excluded), via the Hadoop FS facade — works on any
    * filesystem the write went to. */
  private def listDataFiles(spark: SparkSession, dir: String): Seq[Path] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(_.isFile)
      .map(_.getPath)
      .filter { f =>
        val n = f.getName
        !n.startsWith("_") && !n.startsWith(".") && n.endsWith(".parquet")
      }
      .sortBy(_.getName)
  }

  /** Per-file per-column min/max/null-count entries for the sidecar:
    * one narrow aggregation pass over just `files`, #files result
    * rows on the driver. */
  private def fileStats(
      spark: SparkSession,
      files: Seq[Path],
      cols: Seq[String]): Seq[Map[String, Any]] = {
    if (files.isEmpty) return Seq.empty
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"))
    }
    val stats = spark.read.parquet(files.map(_.toString): _*)
      .groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    stats.sortBy(_.getString(0)).map { r =>
      val name = new Path(r.getString(0)).getName
      val per = cols.zipWithIndex.map { case (c, i) =>
        Map(
          "min" -> r.get(1 + i * 3), "max" -> r.get(2 + i * 3),
          "nulls" -> r.getLong(3 + i * 3))
      }
      Map("name" -> name, "stats" -> per)
    }.toSeq
  }

  private def writeMeta(
      spark: SparkSession, dir: String, meta: Map[String, Any]): Unit = {
    val p = new Path(dir, MetaFile)
    GraftFs.writeString(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration),
      p, TypedJson.write(meta))
  }

  private def readMeta(spark: SparkSession, dir: String): Map[String, Any] = {
    val p = new Path(dir, MetaFile)
    TypedJson
      .parse(GraftFs.readString(
        p.getFileSystem(spark.sparkContext.hadoopConfiguration), p))
      .asInstanceOf[Map[String, Any]]
  }
}
