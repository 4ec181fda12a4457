package graft

import org.apache.spark.sql.SparkSession

import graft.api.Api._

/** The request-loop comparison point: the reference serves N
  * selections as N independent HTTP requests, each a fresh
  * rasterio-read + NumPy reduce (core/services.py extract_timeseries,
  * one request at a time per worker); this engine serves the same N as
  * ONE plan (Api.extractTimeseriesBatch — one cube scan, masks tagged
  * map-side, windows partitioned by selection_id). `main` measures the
  * batch at N=1000 mixed point/bbox/polygon selections with the full
  * transform+smoother stack and prints one JSON line for BASELINE.md.
  *
  * min-of-2 passes, same protocol as [[Bench]] (the box has rotating
  * stall windows; pass 2 also skips one-shot plan/codegen cost).
  */
object BatchBench {

  /** n deterministic mixed selections covering the whole grid: points
    * walk the 150 cells, bboxes slide a 4×3 window, triangles slide a
    * 3×2 one — every selection valid under the same guards the
    * reference applies per request. */
  def selections(n: Int): Seq[BatchSelection] =
    (0 until n).map { i =>
      (i % 3: @unchecked) match {
        case 0 => BatchSelection(s"pt_$i", PointArea((i / 3) % 150))
        case 1 =>
          val x0 = (i / 3) % 6
          val y0 = (i * 7 / 3) % 12
          BatchSelection(s"bb_$i", BBoxArea(x0, x0 + 3, y0, y0 + 2))
        case 2 =>
          val x0 = ((i / 3) % 7).toDouble
          val y0 = ((i * 5 / 3) % 13).toDouble
          BatchSelection(s"tri_$i", PolygonArea(Seq(
            (x0 + 0.2, y0 + 0.2), (x0 + 2.8, y0 + 0.3),
            (x0 + 1.5, y0 + 1.7))))
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.get("SPARK_GRAFT_BATCH_N").map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sels = selections(n)
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = extractTimeseriesBatch(spark, sfDir, "click", sels,
        transform = ZScoreMovingInterval(6),
        smoother = MovingAverageSmoother(centered = true, 5),
        bandRange = (5, 25)).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val (t1, rows) = once()
    val (t2, _) = once()
    val best = math.min(t1, t2)
    val sfName = new java.io.File(sfDir).getName
    println(f"""{"metric":"batch_extract","value":$best%.2f,"unit":"sec","selections":$n,"rows":$rows,"sf":"$sfName"}""")
    spark.stop()
  }
}
