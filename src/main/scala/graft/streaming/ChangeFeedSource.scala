package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{GraftFs, Sidecar}
import graft.operators.Maintenance

/** Structured-Streaming source over a graft table's change feed:
  * `spark.readStream.format("graft").load(dir)` emits each RETAINED
  * generation's row-level delta (the [[Maintenance.changes]] feed —
  * table columns + `change_type` insert/delete) as micro-batches,
  * with offsets = generation numbers from the `_graft_history`
  * ledger. The Delta-CDF streaming pattern for graft tables:
  * downstream pipelines incrementally consume mutations without
  * polling `changesAsOf` in batch.
  *
  * Contract and scale:
  *   - A batch from generation A to B costs O(delta): only files
  *     present in exactly one generation are read ([[Maintenance
  *     .changesBetween]]), so a 0.1% upsert on a 100 TB table streams
  *     a ~0.1%-sized batch however big the table is.
  *   - The stream ticks on RETAINED mutations (`retain = true`).
  *     A `retain = false` mutation archives nothing — its rows
  *     coalesce into the next retained generation's delta (the diff
  *     endpoints are generation snapshots, so nothing is lost, and a
  *     row inserted then deleted between ticks cancels out — exactly
  *     the batch feed's semantics).
  *   - Replay (checkpoint recovery) re-reads `[from, to]` from the
  *     archived metadata — deterministic while those generations
  *     remain un-[[Maintenance.vacuum]]ed. Vacuuming a generation a
  *     checkpoint still references makes recovery fail loudly.
  *   - `option("startingVersion", n | "earliest")` seeds the first
  *     batch; default = the current generation at stream start
  *     (changes from now on only).
  *   - `option("maxGenerationsPerBatch", n)` rate-limits catch-up:
  *     each micro-batch advances at most n generations, so replaying
  *     a long retained history produces bounded batches instead of
  *     one diff over the whole span.
  *
  * Schema is fixed at stream start (table schema + `change_type`).
  * If the table's schema evolves mid-stream the next batch refuses
  * loudly — restart the stream to pick up the new schema.
  */
final class ChangeFeedSource(
    spark: SparkSession,
    path: String,
    declaredSchema: StructType,
    startVersion: Int,
    maxGensPerBatch: Option[Int] = None) extends Source {

  override def schema: StructType = declaredSchema

  /** The current (unarchived) generation's number: one past the
    * newest archived generation — the numbering [[Maintenance
    * .history]] reports. */
  private def currentVersion: Int =
    Maintenance.versions(spark, path).lastOption.map(_ + 1).getOrElse(0)

  /** Highest end offset handed out (or recovered via getBatch) in
    * this process — the floor `maxGenerationsPerBatch` throttles
    * from. Purely a pacing aid: correctness comes from the engine's
    * checkpointed offsets. */
  private var lastEmitted: Option[Int] = None

  override def getOffset: Option[OffsetV1] = {
    val cur = currentVersion
    val floor = math.max(startVersion,
      lastEmitted.getOrElse(startVersion))
    // Rate limiting (the Delta maxFilesPerTrigger analogue at
    // generation granularity): a stream catching up over a long
    // retained history advances at most maxGensPerBatch generations
    // per micro-batch, bounding each batch's delta volume, instead
    // of diffing the full span in one shot.
    val target = maxGensPerBatch match {
      case Some(mx) => math.min(cur, floor + mx)
      case None => cur
    }
    if (target <= startVersion) None
    else {
      lastEmitted = Some(math.max(floor, target))
      Some(LongOffset(target.toLong))
    }
  }

  private def ver(o: OffsetV1): Int = o match {
    case l: LongOffset => l.offset.toInt
    // checkpoint-recovered offsets arrive serialized; LongOffset's
    // json is the bare number
    case other => other.json.trim.toInt
  }

  /** Generation `v` as metadata: the archived snapshot when retained,
    * else the current generation (checked — a vacuumed or
    * never-retained generation refuses instead of silently diffing
    * against the wrong snapshot). */
  private def metaFor(v: Int): Sidecar.Meta = {
    val (fs, dirPath) = GraftFs.resolve(spark, path)
    val f = Maintenance.versionFile(dirPath, v)
    if (GraftFs.statusOf(fs, f).isDefined)
      Sidecar.loadFile(spark, path, f)
    else {
      val cur = currentVersion
      require(v == cur,
        s"generation $v of $path is not retained (vacuumed, or " +
          s"mutated with retain=false past it; current is $cur) — " +
          "the change-feed stream cannot reconstruct its delta. " +
          "Restart the stream from a retained generation.")
      Sidecar.load(spark, path)
    }
  }

  override def getBatch(
      start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(ver).getOrElse(startVersion)
    val to = ver(end)
    // checkpoint recovery lands here before any getOffset: seed the
    // pacing floor so the next batch continues from the recovered end
    if (lastEmitted.forall(_ < to)) lastEmitted = Some(to)
    val batch: DataFrame =
      if (from >= to)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          declaredSchema)
      else {
        val df = Maintenance.changesBetween(
          spark, path, metaFor(from), metaFor(to))
        val missing = declaredSchema.fieldNames
          .filterNot(df.columns.contains)
        require(missing.isEmpty,
          s"the table's schema evolved mid-stream (stream schema " +
            s"columns ${missing.mkString(", ")} are gone from the " +
            "feed); restart the stream to adopt the new schema")
        df.select(declaredSchema.fieldNames.toIndexedSeq
          .map(org.apache.spark.sql.functions.col): _*)
      }
    // getBatch must return an isStreaming frame; the delta plan runs
    // to InternalRows underneath (codegen intact — the RDD boundary
    // sits above the O(delta) batch, not above the table).
    org.apache.spark.sql.GraftBridge.streamingDataFrame(spark,
      org.apache.spark.sql.GraftBridge.toInternalRdd(batch),
      declaredSchema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"ChangeFeedSource[$path]"
}

object ChangeFeedSource {
  /** The stream's row shape: the table's columns plus the feed tag. */
  def feedSchema(table: StructType): StructType =
    StructType(table.fields :+
      StructField("change_type", StringType, nullable = false))

  /** Resolve `startingVersion`: a number, `earliest` (the oldest
    * retained generation), or absent = the current generation at
    * stream start (emit only future changes). */
  def resolveStart(
      spark: SparkSession, path: String,
      parameters: Map[String, String]): Int =
    parameters.get("startingVersion").map(_.trim.toLowerCase) match {
      case Some("earliest") =>
        Maintenance.versions(spark, path).headOption.getOrElse(
          currentOf(spark, path))
      case Some(n) => n.toInt
      case None => currentOf(spark, path)
    }

  private def currentOf(spark: SparkSession, path: String): Int =
    Maintenance.versions(spark, path).lastOption.map(_ + 1).getOrElse(0)
}
