package graft.api

import graft.SparkSpec
import Api._

/** The HTTP serving path's cached-cube parity (r12 verdict item 4):
  * `extractTimeseries(serving = true)` reads the per-session persisted
  * (band, cell) cube instead of re-scanning the event log per request.
  * Every response surface (series, stats, time_range, selection) must
  * be ROW-IDENTICAL to the batch/oracle scan path, across every
  * selection kind and transform — including ZScoreFixedInterval(None),
  * whose statistics depend on the exact extraction band range (the
  * case that would catch a cache path whose band window drifted from
  * bandRangeNanos' ts window).
  */
class ServingCacheSpec extends SparkSpec {

  private val base = TimeseriesRequest(
    datasetId = "click",
    selectedArea = BBoxArea(0, 9, 0, 9),
    bandRange = (5, 25))

  private val sweep: Seq[(String, TimeseriesRequest)] = Seq(
    "bbox mean" -> base,
    "point" -> base.copy(selectedArea = PointArea(23)),
    "polygon median" -> base.copy(
      selectedArea = PolygonArea(
        Seq((0.2, 0.2), (4.8, 0.3), (2.0, 3.6), (0.2, 0.2))),
      zonalStatistic = ZonalMedian),
    "zscore moving + smoothers" -> base.copy(
      transform = ZScoreMovingInterval(6),
      requestedSeriesOptions = Seq(
        SeriesOptions("original", NoSmoother),
        SeriesOptions("centered", MovingAverageSmoother(centered = true, 5)),
        SeriesOptions("trailing", MovingAverageSmoother(centered = false, 3)))),
    "zscore fixed (whole extract)" -> base.copy(
      transform = ZScoreFixedInterval(None),
      requestedSeriesOptions = Seq(
        SeriesOptions("s", MovingAverageSmoother(centered = false, 4)))),
    "zscore fixed interval" -> base.copy(
      transform = ZScoreFixedInterval(Some((8, 18)))),
    // non-default resolution and variable: the serving cube is keyed
    // per (dataset, resolution, variable) — a wrong cache key would
    // serve the wrong axis or the wrong raster here
    "hourly second dataset" -> base.copy(
      datasetId = "view",
      resolution = graft.cube.EventCube.Hourly, bandRange = (5, 80),
      transform = ZScoreMovingInterval(4)),
    "k variable" -> base.copy(variableId = "k", bandRange = (3, 20)))

  private def dump(r: TimeseriesResult): Seq[Set[Seq[Any]]] =
    Seq(r.series, r.summaryStats, r.timeRange)
      .map(_.collect().map(_.toSeq).toSet)

  test("serving path is row-identical to the scan path across the sweep") {
    sweep.foreach { case (name, req) =>
      val b = extractTimeseries(spark, sfDir, req)
      val s = extractTimeseries(spark, sfDir, req, serving = true)
      dump(b).zip(dump(s)).zipWithIndex.foreach { case ((bd, sd), i) =>
        assert(bd === sd, s"sweep '$name' surface $i diverged")
      }
      // selection facts: count exact; the area SUM may differ from the
      // batch path's partition-merge association by float ulps (nothing
      // rounds it downstream), so compare at 1e-12 relative
      val (bc, ba) = { val r0 = b.selection.head(); (r0.getLong(0), r0.getDouble(1)) }
      val (sc, sa) = { val r0 = s.selection.head(); (r0.getLong(0), r0.getDouble(1)) }
      assert(bc === sc, s"sweep '$name' n_cells diverged")
      assert(math.abs(ba - sa) <= 1e-12 * math.abs(ba),
        s"sweep '$name' area diverged: $ba vs $sa")
    }
  }

  test("the serving path runs ONE cluster read; its outputs are local") {
    // class-based collect: an InMemoryRelation PRINTS its original
    // build plan (which names events.parquet), so a textual check
    // can't tell a cache read from a rescan — the logical plan's own
    // relation leaves can: a file relation leaf = a rescan
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val served = extractTimeseries(spark, sfDir, base, serving = true)
    // every response surface is a LOCAL relation — no per-collect
    // cluster re-execution (the r12 profile: stats re-ran the whole
    // window chain per request)
    Seq(served.series, served.summaryStats, served.selection).foreach { df =>
      val lp = df.queryExecution.optimizedPlan
      assert(lp.collect { case l: LogicalRelation => l }.isEmpty &&
        lp.collect { case m: InMemoryRelation => m }.isEmpty,
        s"serving output must be a local relation:\n$lp")
    }
    // the one cluster read goes through the persisted cube, and the
    // batch path keeps its scan-bound shape (the oracle-gated plan)
    val cube = graft.cube.EventCube.servingCube(spark, sfDir, "click",
      graft.cube.EventCube.Daily, "value")
    assert(cube.queryExecution.withCachedData
      .collect { case m: InMemoryRelation => m }.nonEmpty,
      "servingCube must be persisted")
    val batch = extractTimeseries(spark, sfDir, base)
    val blp = batch.series.queryExecution.optimizedPlan
    assert(blp.collect { case l: LogicalRelation => l }.nonEmpty, blp.toString)
  }
}
