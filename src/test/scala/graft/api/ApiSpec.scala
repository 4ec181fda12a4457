package graft.api

import graft.SparkSpec
import Api._

/** End-to-end API behavior mirroring the reference's
  * tests/routers/test_datasets.py (clipping of smoothed series, error
  * surface).
  */
class ApiSpec extends SparkSpec {

  private val baseReq = TimeseriesRequest(
    datasetId = "click",
    selectedArea = BBoxArea(0, 9, 0, 9),
    bandRange = (5, 25))

  test("multi-smoother request clips each series like the reference") {
    val res = extractTimeseries(spark, sfDir, baseReq.copy(
      requestedSeriesOptions = Seq(
        SeriesOptions("original", NoSmoother),
        SeriesOptions("centered", MovingAverageSmoother(centered = true, 5)),
        SeriesOptions("trailing", MovingAverageSmoother(centered = false, 3)))))
    val byName = res.series.collect()
      .groupBy(_.getString(0)).map { case (k, v) => k -> v.map(_.getLong(1)).sorted }
    // full data available on both sides of [5, 25]: all series cover it
    assert(byName("original").toSeq == (5L to 25L))
    assert(byName("centered").toSeq == (5L to 25L))
    assert(byName("trailing").toSeq == (5L to 25L))
    // but at the data edge the window guard clips, reference-style:
    val edge = extractTimeseries(spark, sfDir, baseReq.copy(
      bandRange = (1, 10),
      requestedSeriesOptions =
        Seq(SeriesOptions("trailing", MovingAverageSmoother(centered = false, 3)))))
    val bands = edge.series.collect().map(_.getLong(1)).sorted
    // trailing width 3 needs bands t-3..t-1, so band 4 is the first valid
    assert(bands.toSeq == (4L to 10L))
  }

  test("summary stats cover every requested series plus Original when transformed") {
    val res = extractTimeseries(spark, sfDir, baseReq.copy(
      transform = ZScoreFixedInterval(None)))
    val stats = res.summaryStats.collect()
    // reference behavior (timeseries.py:460-469): transformed requests
    // also report the untransformed interval's stats as "Original"
    assert(stats.map(_.getString(0)).toSet == Set("original", "Original"))
    val zscored = stats.find(_.getString(0) == "original").get
    assert(math.abs(zscored.getDouble(1)) < 1e-6) // z-scored mean ~ 0
    val orig = stats.find(_.getString(0) == "Original").get
    assert(math.abs(orig.getDouble(1)) > 1e-3) // raw series mean is not 0
  }

  test("per-series time_range translates the clipped band range (translate_band_range)") {
    // full data on both sides of [5, 25]: every series reports exactly
    // the requested range, translated to dates
    val res = extractTimeseries(spark, sfDir, baseReq.copy(
      requestedSeriesOptions = Seq(
        SeriesOptions("original", NoSmoother),
        SeriesOptions("trailing", MovingAverageSmoother(centered = false, 3)))))
    val tr = res.timeRange.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(tr("original") === ("2024-01-05", "2024-01-25"))
    assert(tr("trailing") === ("2024-01-05", "2024-01-25"))
    // at the data edge the window guard clips the series start — the
    // reported range is the VALID range ∩ requested (the reference's
    // get_time_range_after_transforms ∩ time_range): trailing width 3
    // from band 1 first yields band 4
    val edge = extractTimeseries(spark, sfDir, baseReq.copy(
      bandRange = (1, 10),
      requestedSeriesOptions =
        Seq(SeriesOptions("trailing", MovingAverageSmoother(centered = false, 3)))))
    val trEdge = edge.timeRange.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(trEdge("trailing") === ("2024-01-04", "2024-01-10"))
    // and the series frame itself carries the band→date translation
    val dates = edge.series.collect().map(r => r.getLong(1) -> r.getString(3)).toMap
    assert(dates(4L) === "2024-01-04" && dates(10L) === "2024-01-10")
    // the range is band-range ARITHMETIC, not derived from emitted
    // rows: a series emptied by the window guard still reports its row
    // (with gte > lte signalling emptiness), like the reference's
    // data-independent get_time_range_after_transforms
    val empty = extractTimeseries(spark, sfDir, baseReq.copy(
      bandRange = (1, 3),
      requestedSeriesOptions =
        Seq(SeriesOptions("trailing", MovingAverageSmoother(centered = false, 3)))))
    assert(empty.series.count() === 0)
    val er = empty.timeRange.collect()
    assert(er.length === 1, "every requested series gets a time_range row")
    assert(er.head.getString(1) === "2024-01-04" &&
      er.head.getString(2) === "2024-01-03")
  }

  test("per-series time_range translates month bands at month resolution") {
    val req = v1MonthlyRequest("click", 12L, Some("2024-01"), Some("2024-01"))
    val res = extractTimeseries(spark, sfDir, req)
    val tr = res.timeRange.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(tr("original") === ("2024-01-01", "2024-01-01"))
    val dates = res.series.collect().map(r => r.getLong(1) -> r.getString(3)).toMap
    assert(dates(1L) === "2024-01-01")
  }

  test("per-series time_range translates hour bands as UTC wall-clock strings") {
    // hourly bands 25..48 = the whole second calendar day
    val res = extractTimeseries(spark, sfDir, baseReq.copy(
      bandRange = (25, 48), resolution = graft.cube.EventCube.Hourly))
    val tr = res.timeRange.collect().head
    assert(tr.getString(1) === "2024-01-02 00:00")
    assert(tr.getString(2) === "2024-01-02 23:00")
  }

  test("fixed z-score (None) stats cover the smoother-widened extract like the reference") {
    // timeseries.py:163-167 + services.py:131-147: with time_range None
    // the transform sees txs == xs — the FULL extract over
    // band_range_to_extract (here [2, 25]: trailing width 3 widens the
    // requested [5, 25] back by 3) — so the z-score stats come from
    // bands 2..25, not the requested 5..25
    import graft.cube.EventCube
    val res = extractTimeseries(spark, sfDir, baseReq.copy(
      transform = ZScoreFixedInterval(None),
      requestedSeriesOptions =
        Seq(SeriesOptions("sm", MovingAverageSmoother(centered = false, 3)))))
    val got = res.series.collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val full = EventCube.zonalSeries(spark, sfDir, "click",
        EventCube.BBox(0, 9, 0, 9), "mean")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val xs = (2L to 25L).map(full)
    val m = xs.sum / xs.size
    val sd = math.sqrt(xs.map(v => (v - m) * (v - m)).sum / xs.size)
    def z(b: Long) = (full(b) - m) / sd
    (5L to 25L).foreach { b =>
      val expected = (z(b - 3) + z(b - 2) + z(b - 1)) / 3.0
      assert(math.abs(got(b) - expected) < 1e-6,
        s"band $b: ${got(b)} != $expected (stats must span the widened extract)")
    }
  }

  test("max_processing_time 0 raises TimeseriesTimeoutError like the reference") {
    // mirrors test_datasets.py:test_timeout (max_processing_time=0)
    intercept[TimeseriesTimeoutError] {
      materializeWithTimeout(spark, 0L) {
        extractTimeseries(spark, sfDir, baseReq).series.count()
      }
    }
  }

  test("generous timeout materializes normally") {
    val n = materializeWithTimeout(spark, 120000L) {
      extractTimeseries(spark, sfDir, baseReq).series.count()
    }
    assert(n > 0)
  }

  test("untransformed request reports no extra Original series") {
    val res = extractTimeseries(spark, sfDir, baseReq)
    assert(res.summaryStats.collect().map(_.getString(0)).toSet == Set("original"))
  }

  test("unknown dataset raises DatasetNotFoundError") {
    intercept[DatasetNotFoundError] {
      extractTimeseries(spark, sfDir, baseReq.copy(datasetId = "nope"))
    }
  }

  test("out-of-bounds selection raises SelectedAreaOutOfBoundsError") {
    intercept[SelectedAreaOutOfBoundsError] {
      extractTimeseries(spark, sfDir,
        baseReq.copy(selectedArea = BBoxArea(50, 60, 0, 5)))
    }
  }

  test("oversized selection raises SelectedAreaTooLargeError") {
    intercept[SelectedAreaTooLargeError] {
      extractTimeseries(spark, sfDir,
        baseReq.copy(selectedArea = BBoxArea(0, 9, 0, 100000)))
    }
  }

  test("inverted band range raises TimeRangeInvalid with the reference message") {
    // distinct from containment in the reference (exceptions.py:19-27):
    // the TimeRange model validator fires before any availability check
    val e = intercept[TimeRangeInvalidError] {
      extractTimeseries(spark, sfDir, baseReq.copy(bandRange = (20, 10)))
    }
    assert(e.getMessage === "Start time step is greater than end time step")
    // a range outside availability (but well-ordered) stays containment
    intercept[TimeRangeContainmentError] {
      extractTimeseries(spark, sfDir, baseReq.copy(bandRange = (40, 50)))
    }
  }

  test("v1 start/end string parsing mirrors the reference") {
    assert(bandForDate(Some("2024"), 99) == 1)
    assert(bandForDate(Some("2024-01"), 99) == 1)
    assert(bandForDate(Some("2024-01-15"), 99) == 15)
    assert(bandForDate(Some("2024-02-01"), 99) == 32)
    assert(bandForDate(None, 7) == 7)
    val req = v1Request("click", 12L, Some("2024-01-05"), Some("2024-01-25"))
    assert(req.bandRange == (5, 25))
    val res = extractTimeseries(spark, sfDir, req)
    assert(res.series.count() > 0)
  }

  test("polygon selection extracts a series and cell count end-to-end") {
    val tri = PolygonArea(Seq((1.2, 0.8), (8.5, 2.2), (3.1, 7.6)))
    val res = extractTimeseries(spark, sfDir, baseReq.copy(selectedArea = tri))
    assert(res.series.count() > 0)
    val sel = res.selection.collect().head
    assert(sel.getLong(0) > 1L, "triangle should mask multiple cells")
  }

  test("feature collection selects the union of its shapes' masks") {
    // second shape sits in the populated row (sf0.001 has cells y<=1)
    val two = FeatureCollectionArea(Seq(
      PolygonArea(Seq((0.2, 0.2), (1.8, 0.2), (1.0, 1.8))),
      PolygonArea(Seq((6.2, 0.1), (8.8, 0.1), (8.8, 0.9), (6.2, 0.9)))))
    val res = extractTimeseries(spark, sfDir, baseReq.copy(selectedArea = two))
    val one = extractTimeseries(spark, sfDir, baseReq.copy(
      selectedArea = PolygonArea(Seq((0.2, 0.2), (1.8, 0.2), (1.0, 1.8)))))
    val nTwo = res.selection.collect().head.getLong(0)
    val nOne = one.selection.collect().head.getLong(0)
    assert(nTwo > nOne, "union mask must cover more cells than one shape")
  }

  test("self-intersecting polygon raises SelectedAreaPolygonIsNotValidError") {
    val bowtie = PolygonArea(Seq((0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0)))
    val e = intercept[SelectedAreaPolygonIsNotValidError] {
      extractTimeseries(spark, sfDir, baseReq.copy(selectedArea = bowtie))
    }
    assert(e.getMessage.contains("not a valid polygon"))
  }

  test("polygon outside the grid raises SelectedAreaOutOfBoundsError") {
    intercept[SelectedAreaOutOfBoundsError] {
      extractTimeseries(spark, sfDir, baseReq.copy(
        selectedArea = PolygonArea(Seq((20.0, 20.0), (25.0, 20.0), (22.0, 24.0)))))
    }
    // boundary-only contact: interior does not intersect (T******** fails)
    intercept[SelectedAreaOutOfBoundsError] {
      extractTimeseries(spark, sfDir, baseReq.copy(
        selectedArea = PolygonArea(Seq((-2.0, 0.0), (0.0, 0.0), (0.0, 2.0), (-2.0, 2.0)))))
    }
  }

  test("oversized polygon raises SelectedAreaTooLargeError") {
    intercept[SelectedAreaTooLargeError] {
      extractTimeseries(spark, sfDir, baseReq.copy(
        selectedArea = PolygonArea(Seq((0.0, 0.0), (9.0, 0.0), (5.0, 2e5)))))
    }
  }

  test("unknown variable raises VariableNotFoundError") {
    intercept[VariableNotFoundError] {
      extractTimeseries(spark, sfDir, baseReq.copy(variableId = "humidity"))
    }
  }

  test("point selection returns single-cell selection metadata") {
    val res = extractTimeseries(spark, sfDir,
      baseReq.copy(selectedArea = PointArea(12L)))
    val sel = res.selection.collect().head
    // area = geodesic m² of the cell's 1° row (cell 12 sits in row 1)
    assert(sel.getLong(0) == 1L)
    assert(sel.getDouble(1) === graft.cube.Geometry.Geo.cellAreaM2(1))
  }

  test("selection area is the geodesic sum of its cells' row areas") {
    import graft.cube.Geometry.Geo
    val res = extractTimeseries(spark, sfDir,
      baseReq.copy(selectedArea = BBoxArea(0, 9, 0, 1)))
    val sel = res.selection.collect().head
    val n = sel.getLong(0)
    assert(n > 10, "sf0.001 has both full rows populated")
    // cells live in rows 0 and 1; the area must be a sum of those two
    // row areas with the right multiplicities
    val expected = (0 until 10).map(_ => Geo.cellAreaM2(0)).sum +
      (0 until (n - 10).toInt).map(_ => Geo.cellAreaM2(1)).sum
    assert(math.abs(sel.getDouble(1) - expected) < 1e-3)
  }

  test("settings JSON body matches the constants and the queryable frame") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val json = mapper.readTree(settingsJson())
    assert(json.get("name").asText() == EngineSettings.Name)
    assert(json.get("max_processing_time").asLong() == MaxProcessingTimeMs)
    assert(json.get("default_max_cells").asLong() == MaxCells)
    assert(json.get("grid").get("width").asLong() ==
      graft.cube.EventCube.GridWidth.toLong)
    assert(json.get("resolutions").size() == EngineSettings.Resolutions.size)
    // the 1-row queryable form carries the same values under the same
    // field names (flat columns; the JSON nests the grid block)
    val row = settings(spark).collect().head
    assert(row.getAs[String]("name") == EngineSettings.Name)
    assert(row.getAs[Long]("max_processing_time") == MaxProcessingTimeMs)
    assert(row.getAs[Long]("grid_width") == json.get("grid").get("width").asLong())
  }
}
