package graft.sources

import org.apache.spark.sql.{GraftRelations, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}

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
  */
final class GraftSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "the graft source requires a path: " +
          "spark.read.format(\"graft\").load(<dataset dir>)"))
    GraftRelations.sidecarRelation(sqlContext.sparkSession, path)
  }
}
