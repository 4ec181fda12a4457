package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec

/** Measured evidence for the Z-ordered cube layout (SURVEY §2
  * skope_cube_spatial): materialize the SAME cube band-sorted and
  * Morton-range-clustered, run the SAME small-bbox zonal query on
  * both, and report what the scan actually decoded — row-group
  * pruning via parquet min/max is invisible in plans, so the honest
  * number is the scan node's output-row metric (rows surviving
  * row-group skip + pushed filters) next to wall time.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ZOrderBench
  * Prints one JSON line.
  */
object ZOrderBench {

  private def scanStats(df: DataFrame): (Long, Long) = {
    df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec =>
        (f.metrics.get("numOutputRows").map(_.value).getOrElse(-1L),
          f.metrics.get("numFiles").map(_.value).getOrElse(-1L))
    }.headOption.getOrElse((-1L, -1L))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE off so the executed plan exposes the scan node's metrics
      // directly (measurement harness only — queries keep AQE on)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bandPath = "/tmp/graft_zob_band"
    val zPath = "/tmp/graft_zob_z"
    // Small row groups so the synthetic cube carries the MANY row
    // groups a 100 TB cube has naturally — at the test scale the whole
    // dataset partition otherwise fits one group and row-group pruning
    // has nothing to skip. Both layouts get the identical knob, so the
    // comparison isolates the CLUSTERING, not the group size.
    val rg = Map("parquet.block.size" -> (8 * 1024).toString,
      "parquet.page.size" -> 1024.toString)
    graft.cube.CubeWriter.materialize(spark, sfDir, bandPath, rg)
    graft.cube.CubeWriter.materializeZOrdered(spark, sfDir, zPath,
      options = rg)

    // small-bbox selection over the full band axis — the
    // selection-heavy access path the Z layout exists for
    def slice(path: String): DataFrame =
      graft.cube.CubeWriter.readSpatialSlice(spark, path, "click",
        2, 4, 3, 5, 1, 1 << 20)
        .groupBy("band").agg(org.apache.spark.sql.functions.avg("v"))

    def run(path: String): (Double, Long, Long) = {
      val df = slice(path)
      df.collect() // warm the file listing + JIT
      val df2 = slice(path)
      val t0 = System.nanoTime()
      df2.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val (rows, files) = scanStats(df2)
      (sec, rows, files)
    }

    val (bSec, bRows, bFiles) = run(bandPath)
    val (zSec, zRows, zFiles) = run(zPath)
    println(s"""{"metric":"zorder_bbox_scan","sf_dir":"$sfDir",""" +
      s""""band_sorted":{"sec":$bSec,"scan_rows":$bRows,"files":$bFiles},""" +
      s""""z_ordered":{"sec":$zSec,"scan_rows":$zRows,"files":$zFiles}}""")
    spark.stop()
  }
}
