package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Cold/warm measurement for the persisted dedup-family lake tables
  * (BASELINE.md evidence, not CI): pass 1 in a fresh catalog pays the
  * one-time ingestion write of the fingerprint-named bucketed tables;
  * pass 2 runs in a NEW session (shared catalog — the cross-JVM leg is
  * CrossJvmIndexSpec's job) with every in-memory artifact dropped, so
  * its time is what a fresh day-2 session pays: corpus fingerprint
  * scan + stored-table reads + the query's own join work.
  *
  * Usage: Test/runMain graft.pipeline.ColdWarmMain <sfDir> <query>...
  */
object ColdWarmMain {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val queries = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(s: SparkSession, q: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(s, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    queries.foreach { q =>
      val cold = time(spark, q)
      ArtifactCache.clear()
      val warm = time(spark.newSession(), q)
      println(f"COLDWARM $q cold=$cold%.1f warm=$warm%.1f")
    }
    spark.stop()
  }
}
