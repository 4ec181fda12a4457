package graft

import org.apache.spark.sql.SparkSession

// throwaway profiling harness — not part of the library surface
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"TIMING $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toList match {
      case "explain" :: qs =>
        qs.foreach { q =>
          println(s"==== $q ====")
          SparkEntry.queries(q)(spark, dir).explain("formatted")
        }
      case qs =>
        time("warmup q1")(SparkEntry.queries("q1_pricing")(spark, dir).count())
        for (q <- qs) {
          time(s"$q run1")(SparkEntry.queries(q)(spark, dir).count())
          time(s"$q run2")(SparkEntry.queries(q)(spark, dir).count())
        }
    }
    spark.stop()
  }
}
