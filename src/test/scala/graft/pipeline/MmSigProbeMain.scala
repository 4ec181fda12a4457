package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Cold/warm probe for the persisted dHash SIGNATURE table alone
  * (BASELINE.md §r20 evidence): the mm_dhash PAIR query is
  * output-quadratic on short-doc corpora at 1000× (the all-zero
  * trailing bands put ~44% of docs into one band bucket), so the
  * scale point that matters for the r19-verdict item 8 lake artifact
  * is the signature build (once per corpus generation) vs the warm
  * read a later consumer pays. Same protocol as ColdWarmMain: cold in
  * a fresh catalog, warm in a new session with every in-memory
  * artifact dropped.
  *
  * Usage: Test/runMain graft.pipeline.MmSigProbeMain <sfDir>
  */
object MmSigProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val cold = time { Multimodal.dhashSigs(spark, dir).count() }
    ArtifactCache.clear()
    val s2 = spark.newSession()
    val warm = time { Multimodal.dhashSigs(s2, dir).count() }
    println(f"MMSIG cold=$cold%.1f warm=$warm%.1f")
    spark.stop()
  }
}
