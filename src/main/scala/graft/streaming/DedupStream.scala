package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous near-duplicate dedup: the streaming analogue of the
  * batch `dedup_incremental` pass. Each micro-batch of newly-ingested
  * documents is minhash-banded and probed against the PERSISTED
  * posting index (pipeline.Dedup.minhashIndexTable — the same bucketed
  * lake table the batch pipeline writes and reads), then
  * exact-verified with the family's Jaccard join, and the qualifying
  * pairs append to a parquet sink.
  *
  * Why foreachBatch and not a stateful streaming operator: the
  * candidate join probes a LAKE TABLE, and the exact verification is
  * a batch join against the stored shingle artifact — the index IS
  * the state, stored durably and shared with the batch pipeline, so
  * per-query streaming state (which is private to one query and dies
  * with its checkpoint) would be the wrong home for it. This is the
  * standard lakehouse shape for stream-vs-corpus joins.
  *
  * Scale: each micro-batch pays exactly the batch incremental cost —
  * the batch's own postings broadcast (or shuffle_hash past the byte
  * bound, still exchange-free on the bucketed index side); the
  * historical corpus never re-pairs with itself.
  *
  * Delivery: foreachBatch re-runs a batch on failure recovery, so the
  * parquet sink is at-least-once; rows carry `batch_id`, and a pair
  * whose two members arrive in different micro-batches is emitted by
  * each (both directions normalized to d1 < d2) — consumers that need
  * set semantics read DISTINCT (d1, d2), which is also what the
  * batch-parity spec asserts.
  */
object DedupStream {

  /** Start the continuous dedup over a stream of document rows
    * (doc_id, text, ...). `dir` locates the corpus whose stored index
    * and shingle artifact verify the batches; `sinkPath` receives
    * append-mode parquet (d1, d2, jac, batch_id). */
  def start(spark: SparkSession, dir: String, docs: DataFrame,
      sinkPath: String, checkpoint: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.pipeline.Dedup.deltaPairs(spark, dir, batch)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(sinkPath)
      }
      .start()
}
