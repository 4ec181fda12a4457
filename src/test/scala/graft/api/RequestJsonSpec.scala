package graft.api

import graft.SparkSpec
import Api._
import RequestJson.{parse, RequestParseError}

/** Wire-format parsing shaped like the reference's request fixtures
  * (under timeseries/data/requests/) — a skope-api client's JSON body
  * drives the engine end-to-end. */
class RequestJsonSpec extends SparkSpec {

  test("a v2-shaped polygon request parses and extracts end-to-end") {
    val json =
      """{
        |  "resolution": "day",
        |  "dataset_id": "click",
        |  "variable_id": "value",
        |  "band_range": [5, 25],
        |  "selected_area": {
        |    "type": "Polygon",
        |    "coordinates": [[[0.2, 0.2], [8.5, 0.2], [4.0, 1.8], [0.2, 0.2]]]
        |  },
        |  "zonal_statistic": "mean",
        |  "transform": { "type": "NoTransform" },
        |  "requested_series_options": [
        |    { "name": "original", "smoother": { "type": "NoSmoother" } },
        |    { "name": "smoothed",
        |      "smoother": { "type": "MovingAverageSmoother",
        |                    "method": "trailing", "width": 3 } }
        |  ]
        |}""".stripMargin
    val req = parse(json)
    assert(req.datasetId === "click")
    assert(req.bandRange === (5, 25))
    assert(req.requestedSeriesOptions.map(_.name) === Seq("original", "smoothed"))
    assert(req.requestedSeriesOptions(1).smoother ===
      MovingAverageSmoother(centered = false, 3))
    val res = extractTimeseries(spark, sfDir, req)
    assert(res.series.count() > 0)
    assert(res.selection.collect().head.getLong(0) > 1)
  }

  test("Point coordinates map to the containing cell like dataset.index") {
    val req = parse(
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.7, 1.2]}}"""
        .stripMargin)
    assert(req.selectedArea === PointArea(12L)) // floor(1.2)*10 + floor(2.7)
    assert(req.bandRange === availableBandsFor(graft.cube.EventCube.Daily))
  }

  test("Feature and FeatureCollection geometries parse") {
    val feature = parse(
      """{"dataset_id": "click", "selected_area": {
        |  "type": "Feature", "properties": {},
        |  "geometry": {"type": "Polygon",
        |    "coordinates": [[[0.1, 0.1], [1.9, 0.1], [1.0, 1.9]]]}}}"""
        .stripMargin)
    assert(feature.selectedArea.isInstanceOf[PolygonArea])
    val fc = parse(
      """{"dataset_id": "click", "selected_area": {
        |  "type": "FeatureCollection", "features": [
        |   {"type": "Feature", "geometry": {"type": "Polygon",
        |     "coordinates": [[[0.1, 0.1], [1.9, 0.1], [1.0, 1.9]]]}},
        |   {"type": "Feature", "geometry": {"type": "Polygon",
        |     "coordinates": [[[6.2, 0.1], [9.4, 0.1], [9.4, 1.8], [6.2, 1.8]]]}}
        |  ]}}""".stripMargin)
    assert(fc.selectedArea.asInstanceOf[FeatureCollectionArea].features.size === 2)
  }

  test("polygon interior rings (holes) parse and subtract from the mask") {
    val donut = parse(
      """{"dataset_id": "click", "band_range": [5, 25],
        |  "selected_area": {"type": "Polygon", "coordinates": [
        |    [[0.4, 0.4], [8.6, 0.4], [8.6, 7.6], [0.4, 7.6], [0.4, 0.4]],
        |    [[2.5, 1.5], [6.5, 1.5], [6.5, 5.5], [2.5, 5.5], [2.5, 1.5]]
        |  ]}}""".stripMargin)
    val solid = donut.copy(selectedArea =
      PolygonArea(donut.selectedArea.asInstanceOf[PolygonArea].ring))
    assert(donut.selectedArea.asInstanceOf[PolygonArea].holes.size === 1)
    val nDonut = extractTimeseries(spark, sfDir, donut)
      .selection.collect().head.getLong(0)
    val nSolid = extractTimeseries(spark, sfDir, solid)
      .selection.collect().head.getLong(0)
    assert(nDonut <= nSolid)
  }

  test("transforms and month resolution parse (monthly fixture shape)") {
    val req = parse(
      """{"resolution": "month", "dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "transform": {"type": "ZScoreMovingInterval", "width": 6}}"""
        .stripMargin)
    assert(req.resolution === graft.cube.EventCube.Monthly)
    assert(req.bandRange === (1, 1))
    assert(req.transform === ZScoreMovingInterval(6))
  }

  test("time_range is the wire format's primary range field (timeseries.py:365)") {
    // v2 clients send dates, not band indices; conversion is
    // find_band_range's job server-side (dataset.py:49-72)
    val req = parse(
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": {"gte": "2024-01-05", "lte": "2024-01-25"}}"""
        .stripMargin)
    assert(req.bandRange === (5, 25))
    assert(extractTimeseries(spark, sfDir, req).series.count() > 0)
    // partial dates snap like the v1 strings: year → Jan 1, month → 1st
    val monthly = parse(
      """{"resolution": "month", "dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": {"gte": "2024-01", "lte": "2024-01"}}""".stripMargin)
    assert(monthly.bandRange === (1, 1))
    // hourly: date bounds widen to whole days
    val hourly = parse(
      """{"resolution": "hour", "dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": {"gte": "2024-01-02", "lte": "2024-01-03"}}"""
        .stripMargin)
    assert(hourly.bandRange === (25, 72))
    // band_range, when present, wins (it is already resolution-native)
    val both = parse(
      """{"dataset_id": "click", "band_range": [3, 7],
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": {"gte": "2024-01-05", "lte": "2024-01-25"}}"""
        .stripMargin)
    assert(both.bandRange === (3, 7))
    // OptionalTimeRange (dataset.py:43-47): a missing bound normalizes
    // to the dataset edge (normalize_time_range), not a parse error
    val open = parse(
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": {"gte": "2024-01-05"}}""".stripMargin)
    assert(open.bandRange === (5, 31))
    val openLo = parse(
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": {"lte": "2024-01-25"}}""".stripMargin)
    assert(openLo.bandRange === (1, 25))
    // find_band_range (dataset.py:84-92): a provided bound outside the
    // dataset's own time range is a containment error at parse/convert
    // time, before any extraction is planned
    intercept[TimeRangeContainmentError](parse(
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": {"gte": "2023-12-25", "lte": "2024-01-25"}}"""
        .stripMargin))
    intercept[TimeRangeContainmentError](parse(
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": {"gte": "2024-01-05", "lte": "2024-02-05"}}"""
        .stripMargin))
    intercept[TimeRangeContainmentError](parse(
      """{"resolution": "month", "dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": {"gte": "2024-03", "lte": "2024-03"}}"""
        .stripMargin))
    // a JSON null bound = an absent bound (OptionalTimeRange's
    // Optional[date]) — NOT the string "null" reaching the date parser
    val nullLo = parse(
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": {"gte": null, "lte": "2024-01-25"}}""".stripMargin)
    assert(nullLo.bandRange === (1, 25))
    // the last calendar day is in-range at EVERY resolution (the
    // declared extent is the same January span: 31 days = 744 hours)
    val hourlyEdge = parse(
      """{"resolution": "hour", "dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": {"gte": "2024-01-05", "lte": "2024-01-31"}}"""
        .stripMargin)
    assert(hourlyEdge.bandRange === (97, 744))
    // malformed dates are a wire-layer parse error, not a raw
    // NumberFormatException / DateTimeException leaking to the caller
    intercept[RequestParseError](parse(
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": {"gte": "not-a-date"}}""".stripMargin))
    intercept[RequestParseError](parse(
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": {"gte": "2024-13-40"}}""".stripMargin))
  }

  test("time_range must be an object — a scalar/array is a parse error, null is absent") {
    // a non-object time_range would make get("gte")/get("lte") return
    // null and silently degrade the request to the full dataset extent;
    // the reference's pydantic layer rejects the body instead
    intercept[RequestParseError](parse(
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": "2024-01-05"}""".stripMargin))
    intercept[RequestParseError](parse(
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": ["2024-01-05", "2024-01-25"]}""".stripMargin))
    // an explicit JSON null is as absent as a missing key
    // (Optional[OptionalTimeRange])
    val nullTr = parse(
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "time_range": null}""".stripMargin)
    assert(nullTr.bandRange === availableBandsFor(graft.cube.EventCube.Daily))
  }

  test("max_processing_time parses, validates its bounds, and is enforced") {
    val base =
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]}%s}"""
        .stripMargin
    assert(parse(base.format("")).maxProcessingTimeMs === MaxProcessingTimeMs)
    assert(parse(base.format(""", "max_processing_time": 5000"""))
      .maxProcessingTimeMs === 5000L)
    // pydantic Field(ge=0, le=settings.max_processing_time) analogue
    intercept[RequestParseError](
      parse(base.format(""", "max_processing_time": -1""")))
    intercept[RequestParseError](
      parse(base.format(""", "max_processing_time": 999999""")))
    // budget 0 cannot materialize anything — the reference's
    // test_timeout shape, through the request contract end-to-end
    intercept[TimeseriesTimeoutError] {
      extractSeriesBounded(spark, sfDir,
        parse(base.format(""", "max_processing_time": 0""")))
    }
    assert(extractSeriesBounded(spark, sfDir, parse(base.format(""))).nonEmpty)
  }

  test("malformed requests raise RequestParseError; invalid polygons still validate") {
    intercept[RequestParseError](parse("""{"selected_area": {}}"""))
    intercept[RequestParseError](parse("not json at all {{{"))
    intercept[RequestParseError](parse(
      """{"dataset_id": "click",
        |  "selected_area": {"type": "Circle", "coordinates": [1, 2]}}"""
        .stripMargin))
    // geometry VALIDITY is still the API layer's job, not the parser's
    val bowtie = parse(
      """{"dataset_id": "click", "selected_area": {"type": "Polygon",
        |  "coordinates": [[[0,0],[2,2],[2,0],[0,2]]]}}""".stripMargin)
    intercept[SelectedAreaPolygonIsNotValidError] {
      extractTimeseries(spark, sfDir, bowtie)
    }
  }

  test("replay data/requests fixture shapes: YearMonth objects and integer years") {
    // data/requests/monthly.json spells time_range bounds as YearMonth
    // OBJECTS {year, month}
    val m = parse(
      """{"resolution": "month", "dataset_id": "click",
        |  "time_range": {"gte": {"year": 2024, "month": 1},
        |                 "lte": {"year": 2024, "month": 1}},
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "zonal_statistic": "mean", "transform": {"type": "NoTransform"},
        |  "requested_series_options": [
        |    {"name": "original", "smoother": {"type": "NoSmoother"}},
        |    {"name": "transformed",
        |     "smoother": {"type": "MovingAverageSmoother",
        |                  "method": "trailing", "width": 7}}]}""".stripMargin)
    assert(m.resolution === graft.cube.EventCube.Monthly)
    assert(m.bandRange === (1, 1))
    assert(m.requestedSeriesOptions.map(_.name) === Seq("original", "transformed"))
    // data/requests/yearly.json spells them as bare integer years, and
    // carries a legacy top-level "transforms" array — pydantic ignores
    // unknown fields, so this parser must too (transform stays default)
    val y = parse(
      """{"resolution": "year", "dataset_id": "click", "variable_id": "value",
        |  "time_range": {"gte": 2024, "lte": 2024},
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "zonal_statistic": "mean",
        |  "transforms": [{"type": "MovingAverageSmoother",
        |                  "method": "centered", "width": 1}]}""".stripMargin)
    assert(y.resolution === graft.cube.EventCube.Yearly)
    assert(y.bandRange === (1, 1))
    assert(y.transform === NoTransform)
    // an object bound must carry BOTH fields — a defaulted month could
    // not be right for both ends of a range
    val e = intercept[RequestParseError](parse(
      """{"resolution": "month", "dataset_id": "click",
        |  "time_range": {"gte": {"year": 2024, "month": 1},
        |                 "lte": {"year": 2024}},
        |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]}}"""
        .stripMargin))
    assert(e.getMessage.contains("month"))
  }

  test("replay data/requests/timeseriesv1.json: v1 body parses and round-trips") {
    val (req, geom) = RequestJson.parseV1(
      """{"datasetId": "click", "variableName": "value",
        |  "boundaryGeometry": {"type": "Point", "coordinates": [2.0, 1.0]},
        |  "start": 2024, "end": "2024-01-10"}""".stripMargin)
    // integer start year → Jan 1 (the reference's _to_date_from_y)
    assert(req.bandRange === (1, 10))
    assert(req.selectedArea === PointArea(12L))
    val res = extractTimeseries(spark, sfDir, req)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val resp = mapper.readTree(ResponseJson.toV1Json(req, geom, res))
    assert(resp.get("datasetId").asText === "click")
    assert(resp.get("boundaryGeometry").get("type").asText === "Point")
    assert(resp.get("start").asText === "2024-01-01")
    assert(resp.get("end").asText === "2024-01-10")
    assert(resp.get("values").size === 10)
    // absent bounds normalize to the dataset edges (to_time_range),
    // and a JSON-null variableName is as absent as a missing key
    val (edges, _) = RequestJson.parseV1(
      """{"datasetId": "click", "variableName": null,
        |  "boundaryGeometry": {"type": "Point", "coordinates": [2.0, 1.0]}}"""
        .stripMargin)
    assert(edges.bandRange === Api.AvailableBands)
    assert(edges.variableId === "value")
  }

  test("replay test_missing_property: a missing required field names itself") {
    // the reference returns 422 with detail.loc naming the missing body
    // field for every required property; this wire format requires
    // dataset_id and selected_area (the rest carry the reference's own
    // defaults), and the parse error must NAME the absent field
    val noDataset = intercept[RequestParseError](parse(
      """{"selected_area": {"type": "Point", "coordinates": [2.0, 1.0]}}"""))
    assert(noDataset.getMessage.contains("dataset_id"))
    val noArea = intercept[RequestParseError](parse(
      """{"dataset_id": "click"}"""))
    assert(noArea.getMessage.contains("selected_area"))
  }

  test("smoother schema validation mirrors timeseries.py:83-97 at parse time") {
    def withSmoother(method: String, width: Int): String =
      s"""{"dataset_id": "click",
         |  "selected_area": {"type": "Point", "coordinates": [2.0, 1.0]},
         |  "requested_series_options": [
         |    {"name": "s", "smoother": {"type": "MovingAverageSmoother",
         |      "method": "$method", "width": $width}}]}""".stripMargin
    // even centered width: the reference 422s at schema validation
    // (width_is_valid_for_window_type); before this guard the batch
    // path threw deep in a window require and the serving fast path
    // silently computed a w+1-row window
    val even = intercept[RequestParseError](parse(withSmoother("centered", 4)))
    assert(even.getMessage.contains("odd"))
    // width bounds (Field ge=1 le=200) and the closed method enum
    assert(intercept[RequestParseError](parse(withSmoother("trailing", 0)))
      .getMessage.contains("[1, 200]"))
    assert(intercept[RequestParseError](parse(withSmoother("trailing", 201)))
      .getMessage.contains("[1, 200]"))
    assert(intercept[RequestParseError](parse(withSmoother("sideways", 3)))
      .getMessage.contains("sideways"))
    // valid spellings still parse
    assert(parse(withSmoother("centered", 5)).requestedSeriesOptions.head
      .smoother === MovingAverageSmoother(centered = true, 5))
    assert(parse(withSmoother("trailing", 200)).requestedSeriesOptions.head
      .smoother === MovingAverageSmoother(centered = false, 200))
  }
}
