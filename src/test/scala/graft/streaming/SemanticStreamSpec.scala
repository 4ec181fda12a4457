package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch-parity proof for the continuous SemDeDup pass (r11 verdict
  * item 5): streaming a delta of embedding rows through SemanticStream
  * must surface exactly the pair set of the batch `dedup_semantic`
  * operator restricted to delta-touching pairs — the streamed vectors
  * route through the SAME corpus-derived centroid hierarchy
  * (semAssignOver), so assignment, candidate join and cosine
  * verification are all definitionally identical; only the candidate
  * restriction differs, and it must be lossless for delta pairs. */
class SemanticStreamSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed delta equals batch dedup_semantic on delta-touching pairs") {
    val s = spark
    import s.implicits._
    val dm = graft.pipeline.Dedup.DeltaMod
    val full = pairs(graft.pipeline.Similarity.dedupSemantic(spark, sfDir)
      .select("v1", "v2", "cos"))
    val expected = full.filter { case (v1, v2, _) =>
      v1 % dm == 0 || v2 % dm == 0 }
    assert(expected.nonEmpty, "corpus should contain delta-touching pairs")
    assert(full.size > expected.size,
      "fixture should contain base-base pairs outside the delta")

    val delta = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % dm === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val (first, second) = delta.splitAt(delta.length / 2)

    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val sink = java.nio.file.Files.createTempDirectory("sem_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sem_ckpt").toString
    val q = SemanticStream.start(spark, sfDir,
      input.toDF().toDF("vec_id", "embedding"), sink, ckpt)
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = pairs(spark.read.parquet(sink)
      .select("v1", "v2", "cos").distinct())
    assert(streamed === expected)
  }

  test("new vectors pair with the corpus AND across micro-batches") {
    val s = spark
    import s.implicits._
    val src = graft.Tables.embeddings(spark, sfDir)
      .orderBy(col("vec_id")).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].head()
    val maxId = graft.Tables.embeddings(spark, sfDir)
      .agg(max("vec_id")).head().getLong(0)
    val n1 = maxId + 31
    val n2 = maxId + 32

    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val sink = java.nio.file.Files.createTempDirectory("sem_new_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sem_new_ckpt").toString
    val q = SemanticStream.start(spark, sfDir,
      input.toDF().toDF("vec_id", "embedding"), sink, ckpt)
    try {
      input.addData((n1, src._2))
      q.processAllAvailable()
      input.addData((n2, src._2))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = pairs(spark.read.parquet(sink).select("v1", "v2", "cos"))
    // identical vector => cosine exactly 1.0; the new-new pair comes
    // through the SIDE index (vectors + postings), the corpus pair
    // through the stored assignment table
    assert(streamed.contains((n1, n2, 1.0)),
      s"cross-batch new-new pair missing from $streamed")
    assert(streamed.contains((src._1, n1, 1.0)),
      s"corpus pair missing from $streamed")
  }

  /** Restart maintenance: side postings AND side vectors fold into the
    * stored lake tables (assignment table + streamed-vector extension),
    * so the new run pairs with the previous run's docs — including the
    * exact cosine verification, whose vectors now come off the folded
    * extension table. Isolated corpus copy (the fold grows the corpus
    * index). */
  test("restart folds side postings AND vectors into the stored tables") {
    val s = spark
    import s.implicits._
    val cDir = java.nio.file.Files
      .createTempDirectory("sem_fold_corpus").toString
    graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") % 3 === 0)
      .write.parquet(cDir + "/embeddings.parquet")
    val src = graft.Tables.embeddings(spark, cDir)
      .orderBy(col("vec_id")).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].head()
    val maxId = graft.Tables.embeddings(spark, cDir)
      .agg(max("vec_id")).head().getLong(0)
    val n1 = maxId + 41
    val n2 = maxId + 42
    val sink = java.nio.file.Files.createTempDirectory("sem_fold").toString
    val c1 = java.nio.file.Files.createTempDirectory("sem_fold_c1").toString
    val c2 = java.nio.file.Files.createTempDirectory("sem_fold_c2").toString

    implicit val sqlCtx = s.sqlContext
    val in1 = MemoryStream[(Long, Array[Float])]
    val q1 = SemanticStream.start(spark, cDir,
      in1.toDF().toDF("vec_id", "embedding"), sink, c1)
    try {
      in1.addData((n1, src._2))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(new java.io.File(sink + "_idx_vectors").exists())

    val in2 = MemoryStream[(Long, Array[Float])]
    val q2 = SemanticStream.start(spark, cDir,
      in2.toDF().toDF("vec_id", "embedding"), sink, c2)
    assert(!new java.io.File(sink + "_idx_vectors").exists(),
      "restart should have folded and deleted the side tables")
    try {
      in2.addData((n2, src._2))
      q2.processAllAvailable()
    } finally q2.stop()

    val streamed = pairs(spark.read.parquet(sink).select("v1", "v2", "cos"))
    // the cross-run pair needs BOTH folded artifacts: n1's cluster key
    // from the assignment table and n1's vector for the cosine
    assert(streamed.contains((n1, n2, 1.0)),
      s"cross-run pair missing from $streamed")
    val folded = graft.pipeline.Similarity.semStreamVecsTable(spark, cDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(folded(n1))
    // and the BATCH query now sees the grown corpus: the folded doc's
    // pairs appear in dedup_semantic for this dir
    val batch = pairs(graft.pipeline.Similarity.dedupSemantic(spark, cDir)
      .select("v1", "v2", "cos"))
    assert(batch.contains((src._1, n1, 1.0)),
      s"grown-corpus batch pair missing")
  }

  test("a corpus-resident vec_id folds no duplicate into semvecs") {
    import org.apache.spark.sql.functions._
    val cDir = java.nio.file.Files
      .createTempDirectory("graft_semdup").toString
    graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 64)
      .write.parquet(cDir + "/embeddings.parquet")
    val S = graft.pipeline.Similarity
    // replay shape: a batch whose ids ALREADY live in the corpus — the
    // posting append skips them (the first-touch build assigned the
    // whole corpus), and the vector append must skip them too, or
    // dedupSemantic's corpus ∪ semvecs verification base emits every
    // pair for these ids twice
    val corpusBatch = S.normedOfBatch(
      graft.Tables.embeddings(spark, cDir).filter(col("vec_id") < 8))
    import spark.implicits._
    val post = S.semAssignOver(spark, cDir,
      corpusBatch.select(col("vec_id"), col("v"), col("nrm"))
        .as[(Long, Array[Double], Double)],
      graft.pipeline.Dedup.BroadcastVerifyBytes)
    assert(S.appendSemToIndex(spark, cDir, post, corpusBatch) === 0L)
    assert(S.semStreamVecsTable(spark, cDir).count() === 0L,
      "corpus-resident vec_ids duplicated into graft_semvecs_")
    val dups = S.dedupSemantic(spark, cDir)
      .groupBy(col("v1"), col("v2")).count()
      .filter(col("count") > 1).count()
    assert(dups === 0L, "duplicate (v1, v2) pairs in dedup_semantic")
  }
}
