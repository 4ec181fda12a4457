package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingest-path measurement for the persisted ANN index (BASELINE.md
  * evidence, not CI): what a production owner pays to BUILD the trained
  * index once, FOLD a batch of new vectors into it (encode-only, the
  * appendAnnToIndex maintenance write), and LOOK the batch up against
  * the grown index (annSearch — the online ingest+lookup shape
  * AnnStream runs per micro-batch). Runs against an ISOLATED copy of
  * <sfDir>'s embeddings: folding into the shared corpus index would
  * poison later bench runs' candidate sets.
  *
  * Usage: Test/runMain graft.pipeline.AnnIngestMain <sfDir> <batchN>
  */
object AnnIngestMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val iso = java.nio.file.Files.createTempDirectory("graft_anningest")
      .toString
    graft.Tables.embeddings(spark, dir)
      .write.parquet(iso + "/embeddings.parquet")

    // the batch: copies of the first n corpus vectors under fresh ids —
    // realistic near-dup ingest, materialized OUTSIDE the timings
    val batchRaw = graft.Tables.embeddings(spark, iso)
      .filter(col("vec_id") < n)
      .withColumn("vec_id", col("vec_id") + 10000000L)
    val batchVecs = Similarity.normedOfBatch(batchRaw)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    batchVecs.count()

    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // one-time write: k-means training + corpus assignment + the
    // partitioned code-table write (first touch through the query path)
    val build = t { Similarity.annIvfPqTrained(spark, iso).count() }
    val fold = t {
      val appended =
        Similarity.appendAnnToIndex(spark, iso, batchVecs, "trained")
      require(appended == n.toLong, s"expected $n appends, got $appended")
    }
    val lookup = t { Similarity.annSearch(spark, iso, batchRaw).count() }
    println(f"ANNINGEST dir=$dir n=$n build=$build%.1f fold=$fold%.1f lookup=$lookup%.1f")
    spark.stop()
  }
}
