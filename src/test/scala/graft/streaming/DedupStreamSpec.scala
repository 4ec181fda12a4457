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

  /** The advertised use case: documents the stored corpus has NEVER
    * seen. Two copies of one corpus document arrive in two different
    * micro-batches — each must pair with the corpus original (index
    * probe), with every near-dup partner of the original, and with
    * EACH OTHER (cross-batch new-new, via the stream's side index);
    * the old shape emitted nothing for all of these. */
  test("genuinely new documents pair with the corpus AND across batches") {
    val s = spark
    import s.implicits._
    val full = graft.pipeline.Dedup.minhashLsh(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // a corpus doc that has at least one near-dup partner, so the
    // "partners of the original" leg is non-trivial
    val srcId = full.head._1
    val srcText = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === srcId).select("text").head().getString(0)
    val maxId = graft.Tables.documents(spark, sfDir)
      .agg(max("doc_id")).head().getLong(0)
    val n1 = maxId + 1
    val n2 = maxId + 2

    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String)]
    val sink = java.nio.file.Files.createTempDirectory("dedup_new_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dedup_new_ckpt").toString
    val q = DedupStream.start(spark, sfDir,
      input.toDF().toDF("doc_id", "text"), sink, ckpt)
    try {
      input.addData(Seq((n1, srcText)))
      q.processAllAvailable()
      input.addData(Seq((n2, srcText)))
      q.processAllAvailable()
    } finally q.stop()

    val partners = full.collect {
      case (a, b, j) if a == srcId => (b, j)
      case (a, b, j) if b == srcId => (a, j)
    }
    val expected =
      (for { n <- Seq(n1, n2); (p, j) <- partners + ((srcId, 1.0)) }
        yield (math.min(n, p), math.max(n, p), j)).toSet + ((n1, n2, 1.0))
    val streamed = spark.read.parquet(sink)
      .select("d1", "d2", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === expected)
    // the cross-batch new-new pair is present — the side-index path
    assert(streamed.contains((n1, n2, 1.0)))
  }

  /** Failure recovery re-runs a batch with the SAME batch_id; the
    * dynamic-partition-overwrite sink must make that replay replace —
    * ROW-level equality, not just DISTINCT-set equality. */
  test("replaying a batch_id is idempotent (row-level, all sinks)") {
    val s = spark
    import s.implicits._
    val srcText = graft.Tables.documents(spark, sfDir)
      .select("text").head().getString(0)
    val maxId = graft.Tables.documents(spark, sfDir)
      .agg(max("doc_id")).head().getLong(0)
    val sink = java.nio.file.Files.createTempDirectory("dedup_replay").toString
    def batchDf(id: Long) = Seq((id, srcText)).toDF("doc_id", "text")
    DedupStream.processBatch(spark, sfDir, batchDf(maxId + 11), sink, 0L)
    DedupStream.processBatch(spark, sfDir, batchDf(maxId + 12), sink, 1L)
    def snapshot(path: String): Seq[String] =
      spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    val before =
      (snapshot(sink), snapshot(sink + "_idx_postings"),
        snapshot(sink + "_idx_shingles"))
    // the replay: batch 1 runs again, identical input, same batch_id
    DedupStream.processBatch(spark, sfDir, batchDf(maxId + 12), sink, 1L)
    val after =
      (snapshot(sink), snapshot(sink + "_idx_postings"),
        snapshot(sink + "_idx_shingles"))
    assert(after === before)
    // and nothing duplicated: every (d1, d2) appears exactly once
    val dup = spark.read.parquet(sink).groupBy("d1", "d2")
      .count().filter(col("count") > 1).count()
    assert(dup === 0L)
  }
}
