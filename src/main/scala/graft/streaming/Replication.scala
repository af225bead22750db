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
  * [[ChangeFeedSource]]) applies as ONE [[Maintenance.merge]] commit,
  * consuming the feed's CDF vocabulary directly: `insert` and
  * `update_postimage` rows upsert, `delete` rows remove by index key,
  * `update_preimage` rows are informational (the new state is the
  * postimage). Per-batch cost is O(delta + affected replica
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
  * or before the stream's starting generation), mutations must be
  * retained (`retain = true`) on the source like every change-feed
  * consumer, and the source's index keys must be UNIQUE: applying by
  * key cannot represent two rows sharing one. A batch whose delta
  * reveals duplicate source keys (two gains on one key, or a gain
  * and an unpaired loss) fails loudly instead of silently diverging.
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
        // computation): materialize once for the reads below
        val b = batch.persist()
        try {
          if (!b.isEmpty) {
            val upserts = b.filter(
              col("change_type").isin("insert", "update_postimage"))
              .drop("change_type")
            val deletes = b.filter(col("change_type") === "delete")
              .select(keys.map(col): _*).distinct()
            // Unique-key contract: two upserts on one key means the
            // source holds duplicate index keys (the feed pairs a
            // 1-loss/1-gain key as an update, so surviving
            // multiplicities are real duplicates); an upsert AND a
            // delete on one key means a duplicate-keyed row set lost
            // some but not all copies. Either way a by-key apply
            // would diverge. merge's OWN fused validation aggregate
            // checks exactly these two conditions (update keys
            // unique; update∩delete empty), so no separate pre-check
            // aggregate runs per micro-batch — its refusal is
            // translated into the replication contract's terms.
            try Maintenance.merge(s, dstDir, upserts.toDF(), deletes.toDF())
            catch {
              case e: IllegalArgumentException
                  if e.getMessage != null &&
                    (e.getMessage.contains("update keys must be unique") ||
                      e.getMessage.contains(
                        "may not appear in both updates and deletes")) =>
                throw new IllegalStateException(
                  s"replication of $srcDir requires unique index keys: " +
                    "the change feed carries conflicting operations " +
                    s"for some key of (${keys.mkString(", ")}) — the " +
                    "source holds duplicate rows per key, which a " +
                    s"by-key apply cannot represent (${e.getMessage})")
            }
            ()
          }
        } finally { b.unpersist(); () }
      }
      .start()
  }
}
