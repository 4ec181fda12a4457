package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch-parity proof for the continuous simhash pass (r11 verdict
  * item 5): streaming a delta through SimhashStream (split across
  * micro-batches) must surface exactly the pair set of the batch
  * `dedup_simhash` operator restricted to delta-touching pairs — same
  * signature kernel, same triple keys, same canonical-emission +
  * hamming arithmetic, so the only degree of freedom is the candidate
  * restriction, which must be lossless for pairs with a delta member. */
class SimhashStreamSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Number](2).longValue())).toSet // hamming is int (bit_count)

  test("streamed delta equals batch dedup_simhash on delta-touching pairs") {
    val s = spark
    import s.implicits._
    val dm = graft.pipeline.Dedup.DeltaMod
    val full = pairs(graft.pipeline.Dedup.simhash(spark, sfDir)
      .select("d1", "d2", "hamming"))
    val expected = full.filter { case (d1, d2, _) =>
      d1 % dm == 0 || d2 % dm == 0 }
    assert(expected.nonEmpty, "corpus should contain delta-touching pairs")
    assert(full.size > expected.size,
      "fixture should contain base-base pairs outside the delta")

    val delta = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % dm === 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    val (first, second) = delta.splitAt(delta.length / 2)

    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String)]
    val sink = java.nio.file.Files.createTempDirectory("sh_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sh_ckpt").toString
    val q = SimhashStream.start(spark, sfDir,
      input.toDF().toDF("doc_id", "text"), sink, ckpt)
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = pairs(spark.read.parquet(sink)
      .select("d1", "d2", "hamming").distinct())
    assert(streamed === expected)
  }

  test("new documents pair with the corpus AND across micro-batches") {
    val s = spark
    import s.implicits._
    val srcText = graft.Tables.documents(spark, sfDir)
      .select("text").head().getString(0)
    val maxId = graft.Tables.documents(spark, sfDir)
      .agg(max("doc_id")).head().getLong(0)
    val n1 = maxId + 21
    val n2 = maxId + 22

    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String)]
    val sink = java.nio.file.Files.createTempDirectory("sh_new_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sh_new_ckpt").toString
    val q = SimhashStream.start(spark, sfDir,
      input.toDF().toDF("doc_id", "text"), sink, ckpt)
    try {
      input.addData((n1, srcText))
      q.processAllAvailable()
      input.addData((n2, srcText))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = pairs(spark.read.parquet(sink)
      .select("d1", "d2", "hamming"))
    // identical text => identical signature => hamming 0, found via the
    // SIDE index (n1 was never in the corpus posting table)
    assert(streamed.contains((n1, n2, 0L)),
      s"cross-batch new-new pair missing from $streamed")
    // and each copy paired with the corpus original through the stored
    // index (hamming 0 against the source doc)
    val srcId = graft.Tables.documents(spark, sfDir)
      .filter(col("text") === srcText)
      .agg(min("doc_id")).head().getLong(0)
    assert(streamed.contains((srcId, n1, 0L)) || streamed.contains((srcId, n2, 0L)),
      s"corpus pair missing from $streamed")
  }

  /** Restart maintenance: the side posting chain folds into the STORED
    * triple index, so the new run's batches pair with the previous
    * run's docs through the lake table alone. Isolated corpus copy —
    * the fold grows the corpus index, which must never happen to the
    * shared sfDir fixtures. */
  test("restart folds the side index into the stored lake table") {
    val s = spark
    import s.implicits._
    val cDir = java.nio.file.Files
      .createTempDirectory("sh_fold_corpus").toString
    graft.Tables.documents(spark, sfDir).filter(col("doc_id") % 3 === 0)
      .write.parquet(cDir + "/documents.parquet")
    val srcText = graft.Tables.documents(spark, cDir)
      .select("text").head().getString(0)
    val maxId = graft.Tables.documents(spark, cDir)
      .agg(max("doc_id")).head().getLong(0)
    val sink = java.nio.file.Files.createTempDirectory("sh_fold").toString
    val c1 = java.nio.file.Files.createTempDirectory("sh_fold_c1").toString
    val c2 = java.nio.file.Files.createTempDirectory("sh_fold_c2").toString

    implicit val sqlCtx = s.sqlContext
    val in1 = MemoryStream[(Long, String)]
    val q1 = SimhashStream.start(spark, cDir,
      in1.toDF().toDF("doc_id", "text"), sink, c1)
    try {
      in1.addData((maxId + 1, srcText))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(new java.io.File(sink + "_idx_postings").exists())

    val in2 = MemoryStream[(Long, String)]
    val q2 = SimhashStream.start(spark, cDir,
      in2.toDF().toDF("doc_id", "text"), sink, c2)
    assert(!new java.io.File(sink + "_idx_postings").exists(),
      "restart should have folded and deleted the side index")
    try {
      in2.addData((maxId + 2, srcText))
      q2.processAllAvailable()
    } finally q2.stop()

    val streamed = pairs(spark.read.parquet(sink)
      .select("d1", "d2", "hamming"))
    assert(streamed.contains((maxId + 1, maxId + 2, 0L)),
      s"cross-run pair missing from $streamed")
    val storedIds = graft.pipeline.Dedup.simhashIndexTable(spark, cDir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(storedIds(maxId + 1))
  }
}
