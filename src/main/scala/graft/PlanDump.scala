package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` output for named queries to files —
  * the optimization-round evidence tool (plans/rNN/<query>_{before,
  * after}.txt). Usage:
  *
  *   runMain graft.PlanDump <sfDir> <outDir> <suffix> <query>...
  *
  * writes <outDir>/<query>_<suffix>.txt per query. Session config
  * matches graft.Bench so the dumped plan is the plan the bench runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <query>...")
      sys.exit(2)
    }
    val dir = args(0)
    val out = new java.io.File(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSeq
    out.mkdirs()
    // the ONE bench session builder (Bench.session) — not a copied
    // config block that could drift from what the bench runs
    val spark = Bench.session()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(
        new java.io.File(out, s"${n}_$suffix.txt"), "UTF-8")
      try w.write(txt) finally w.close()
      println(s"[plandump] wrote ${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
