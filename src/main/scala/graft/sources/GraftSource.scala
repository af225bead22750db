package graft.sources

import org.apache.spark.sql.{DataFrame, GraftRelations, SQLContext, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}

import graft.core.{GraftFs, PDataset}

/** `spark.read.format("graft").load(dir)` — plain-SQL access to a
  * sidecar-carrying dataset directory (the engine's write format:
  * `_padawan_metadata.json` + `_padawan_schema` + part files).
  *
  * The returned relation serves its file listing, schema and
  * lex-tuple bounds from the sidecar: zero directory listings, zero
  * footer reads at plan time, and pushed filters on the index
  * columns prune whole FILES inside Catalyst — SQL users get the
  * same skipping `PDataset.slice` gives, without touching the
  * engine API. Registered under the short name `graft` via the
  * standard `DataSourceRegister` service file.
  *
  * The write side —
  * `df.write.format("graft").option("index", "c1,c2").save(dir)` —
  * range-partitions on the index columns (one shuffle; `files`
  * option pins the file count), sorts within partitions for tight
  * rowgroup stats, writes parquet, and computes the sidecar in ONE
  * stats job, so the directory reopens with pruning by any reader.
  * Append recomputes the sidecar over all files (per-file bounds
  * may then overlap across generations — pruning stays sound, it
  * is per file).
  */
final class GraftSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "the graft source requires a path: " +
          "spark.read.format(\"graft\").load(<dataset dir>)"))
    val spark = sqlContext.sparkSession
    // option("version", n): read an archived generation (time
    // travel over retained maintenance history).
    parameters.get("version") match {
      case Some(v) => GraftRelations.sidecarRelationFor(spark, path,
        graft.operators.Maintenance.versionMeta(spark, path, v.toInt))
      case None => GraftRelations.sidecarRelation(spark, path)
    }
  }

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "the graft source requires a path: " +
          "df.write.format(\"graft\").option(\"index\", \"c1,c2\").save(<dir>)"))
    val index = parameters.get("index")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "the graft sink requires option 'index': comma-separated " +
          "columns the dataset is range-clustered and pruned on"))
    val spark = sqlContext.sparkSession
    val (fs, p) = GraftFs.resolve(spark, path)
    val exists = GraftFs.statusOf(fs, p).isDefined
    if (mode == SaveMode.Ignore && exists)
      return createRelation(sqlContext, parameters)
    // Fail fast on a bad bloom option BEFORE the expensive write.
    val bloomCols = parameters.get("bloom")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    bloomCols.foreach { c =>
      require(data.columns.contains(c), s"bloom option: no such column $c")
    }
    val keys = index.map(col)
    val shaped = parameters.get("files").map(_.toInt) match {
      case Some(n) => data.repartitionByRange(n, keys: _*)
      case None => data.repartitionByRange(keys: _*)
    }
    shaped.sortWithinPartitions(keys: _*)
      .write.mode(mode).parquet(path)
    PDataset.writeMetadata(spark, path, index)
    // option("bloom", "c1,c2"): per-file point-lookup filters for
    // non-index columns, built right after the sidecar (one job).
    if (bloomCols.nonEmpty)
      graft.core.BloomIndex.build(spark, path, bloomCols)
    createRelation(sqlContext, parameters)
  }
}
