package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch-parity proof for the continuous near-dup pass: streaming the
  * dedup_incremental delta through DedupStream (split across several
  * micro-batches) must surface exactly the pair set the batch
  * incremental pass computes on the same delta — the stored index is
  * shared state, so a pair whose members arrive in different batches
  * is still found (each member probes the index, which holds the
  * other). */
class DedupStreamSpec extends SparkSpec {

  test("streamed delta equals batch dedup_incremental on the same delta") {
    val s = spark
    import s.implicits._
    val batchPairs = graft.pipeline.Dedup.incremental(spark, sfDir)
      .select("d1", "d2", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batchPairs.nonEmpty, "delta should contain qualifying pairs")

    val delta = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % graft.pipeline.Dedup.DeltaMod === 0)
      .select("doc_id", "text")
      .as[(Long, String)].collect()
    // split the delta across micro-batches so cross-batch pairs are
    // exercised (found via the shared index, not intra-batch joins)
    val (first, second) = delta.splitAt(delta.length / 2)

    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String)]
    val sink = java.nio.file.Files.createTempDirectory("dedup_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dedup_ckpt").toString
    val q = DedupStream.start(spark, sfDir,
      input.toDF().toDF("doc_id", "text"), sink, ckpt)
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(sink)
      .select("d1", "d2", "jac").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === batchPairs)
    // and the cross-batch path was real: at least one pair spans the
    // two micro-batches (otherwise the split proved nothing)
    val firstIds = first.map(_._1).toSet
    val secondIds = second.map(_._1).toSet
    val spanning = batchPairs.exists { case (a, b, _) =>
      (firstIds(a) && secondIds(b)) || (firstIds(b) && secondIds(a))
    }
    assert(spanning, "fixture should contain a pair spanning the batches")
  }
}
