package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.VectorIndex

/** Streaming twin of the persisted-ANN-index ingestion path: an
  * unbounded embedding stream grows the index continuously with a
  * near-dup gate in front — the vector analogue of
  * [[DocumentStreams.dedupSink]].
  */
object VectorStreams {

  /** Continuous NEAR-DUP-gated vector ingestion: each micro-batch
    * runs [[VectorIndex.dedupVectorBatch]] against the persisted
    * index (batch-only cell assignment + cell equi-joins; no indexed
    * vector is ever re-encoded) and appends the SURVIVORS through
    * [[VectorIndex.addVectors]], so the next batch dedups against
    * everything ingested before it.
    *
    * Exactly-once: each append is stamped with an (appId, batchId)
    * txn pair committed in the same atomic sidecar swap as its files,
    * so a crash-replayed micro-batch no-ops on the already-committed
    * version — and the gate itself is replay-safe (a batch vector
    * never near-dups its own appended copy: same id). Single table,
    * so there is no cross-table ordering to protect, unlike
    * `dedupSink`'s corpus-first discipline.
    *
    * `autoCompactOverlap = Some(n)` closes the maintenance loop
    * inside the sink: an append that leaves `layout_max_overlap > n`
    * is followed by [[VectorIndex.compact]] (results pinned
    * unchanged). `appId` defaults to a checkpoint-derived id —
    * stable across restarts, distinct across sinks. */
  def vectorSink(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      indexDir: String,
      checkpointDir: String,
      threshold: Double = 0.99,
      nprobe: Int = 4,
      appId: Option[String] = None,
      autoCompactOverlap: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val app = appId.getOrElse(s"graft-vector-sink:$checkpointDir")
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          val spark = batch.sparkSession
          val survivors = VectorIndex.dedupVectorBatch(spark,
            batch.toDF(), idCol, vecCol, indexDir, threshold, nprobe)
            .persist()
          try {
            if (!survivors.isEmpty) {
              VectorIndex.addVectors(spark, survivors, idCol, vecCol,
                indexDir, txn = Some((app, batchId)),
                autoCompactOverlap = autoCompactOverlap)
              ()
            }
          } finally { survivors.unpersist(); () }
      }
      .start()
  }
}
