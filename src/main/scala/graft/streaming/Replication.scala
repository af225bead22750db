package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.Sidecar
import graft.operators.Maintenance

/** Continuous table replication off the change-feed stream — the
  * Delta "CLONE + CDC apply" pattern for graft tables: seed a replica
  * from a snapshot once, then let every retained mutation of the
  * source flow to it incrementally.
  *
  * Each micro-batch (one or more retained generations' deltas from
  * [[ChangeFeedSource]]) applies as ONE [[Maintenance.merge]] commit:
  * `insert` rows upsert, `delete` rows remove by index key, and a
  * delete whose key also inserts in the same batch is an UPDATE —
  * subsumed by the upsert (the feed's delete carries the OLD row, the
  * insert the new one). Per-batch cost is O(delta + affected replica
  * partitions); the replica is never rescanned.
  *
  * Delivery is at-least-once (foreachBatch may re-run a batch after a
  * crash), and the apply is idempotent: re-upserting identical rows
  * and re-deleting absent keys both converge to the same replica
  * state.
  *
  * Contract: `dstDir` must exist with the SAME index columns as the
  * source (seed it by writing a snapshot — e.g.
  * `PDataset.scanParquet(spark, src)` re-written at the replica — at
  * or before the stream's starting generation). Mutations must be
  * retained (`retain = true`) on the source, like every change-feed
  * consumer.
  */
object Replication {

  def replicaSink(
      spark: SparkSession,
      srcDir: String,
      dstDir: String,
      checkpointDir: String,
      startingVersion: Option[String] = None,
      maxGenerationsPerBatch: Option[Int] = None): StreamingQuery = {
    val srcKeys = Sidecar.load(spark, srcDir).indexColumns
    val dstKeys = Sidecar.load(spark, dstDir).indexColumns
    require(srcKeys == dstKeys && srcKeys.nonEmpty,
      s"replication applies by index key: source ($srcDir) keys " +
        s"${srcKeys.mkString(",")} must equal replica ($dstDir) keys " +
        s"${dstKeys.mkString(",")}")
    val reader = spark.readStream.format("graft")
    startingVersion.foreach(reader.option("startingVersion", _))
    maxGenerationsPerBatch.foreach(n =>
      reader.option("maxGenerationsPerBatch", n.toString))
    reader.load(srcDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
        val s = batch.sparkSession
        val keys = Sidecar.load(s, dstDir).indexColumns.toSeq
        // the batch plan re-executes per action (it wraps the delta
        // computation): materialize once for the three reads below
        val b = batch.persist()
        try {
          if (!b.isEmpty) {
            val inserts = b.filter(col("change_type") === "insert")
              .drop("change_type").dropDuplicates(keys)
            val deletes = b.filter(col("change_type") === "delete")
              .select(keys.map(col): _*).distinct()
              .join(inserts.select(keys.map(col): _*), keys, "left_anti")
            Maintenance.merge(s, dstDir, inserts.toDF(), deletes.toDF())
            ()
          }
        } finally { b.unpersist(); () }
      }
      .start()
  }
}
