package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.cube.EventCube
import Api._

/** JSON request parsing — the reference's wire format
  * (timeseries/app/schemas/timeseries.py TimeseriesRequest +
  * geojson_pydantic geometries; acceptance shapes under
  * timeseries/data/requests/), so a skope-api client's request
  * body drives this engine unchanged. Geometry coordinates are in the
  * grid's CRS (the documented geo-transform, Geometry.Geo): a request
  * against the real service uses lon/lat the same way against its
  * raster transform.
  *
  * Jackson (already on the Spark classpath) does the tree parsing; the
  * result is the same typed TimeseriesRequest the programmatic API
  * uses, so all validation (polygon validity, bounds, budget, variable
  * and range checks) happens in extractTimeseries exactly once.
  */
object RequestJson {

  private val mapper = new ObjectMapper()

  final case class RequestParseError(msg: String)
    extends RuntimeException(s"malformed timeseries request: $msg")

  def parse(json: String): TimeseriesRequest = {
    val root =
      try mapper.readTree(json)
      catch { case e: Exception => throw RequestParseError(e.getMessage) }
    def req(name: String): JsonNode = {
      val n = root.get(name)
      if (n == null) throw RequestParseError(s"missing field $name")
      n
    }
    val resolution = Option(root.get("resolution")).map(_.asText("day"))
      .getOrElse("day") match {
      case "day" => EventCube.Daily
      case "hour" => EventCube.Hourly
      case "month" => EventCube.Monthly
      case "year" => EventCube.Yearly
      case other => throw RequestParseError(s"unsupported resolution $other")
    }
    // strict integer bounds: asInt would silently coerce a malformed
    // value ("abc", null, 1.5-as-string) to 0 — band 0 is a range the
    // client never asked for, not an error
    def intBound(n: JsonNode, what: String): Int = {
      if (n == null || !n.canConvertToInt)
        throw RequestParseError(s"$what must be an integer")
      n.asInt
    }
    val bandRange = Option(root.get("band_range")) match {
      case Some(br) if br.isArray && br.size == 2 =>
        (intBound(br.get(0), "band_range[0]"), intBound(br.get(1), "band_range[1]"))
      case Some(_) => throw RequestParseError("band_range must be [lo, hi]")
      case None => Option(root.get("time_range")) match {
        // the wire format's primary range field (timeseries.py:365):
        // ISO-ish dates converted server-side (find_band_range); a
        // missing bound is the dataset edge (OptionalTimeRange +
        // normalize_time_range, dataset.py:43-47,72-76), and an
        // out-of-range bound raises TimeRangeContainmentError there
        // a JSON null time_range is as absent as a missing key
        // (pydantic's Optional[OptionalTimeRange] admits both)
        case Some(tr) if tr.isNull => availableBandsFor(resolution)
        case Some(tr) =>
          // a non-object node ("2024", [..]) must be a parse error like
          // the reference's pydantic validation — get("gte") on it
          // returns null, which would silently degrade the request to
          // the full dataset extent
          if (!tr.isObject)
            throw RequestParseError("time_range must be an object with gte/lte")
          // a JSON null bound is as absent as a missing key
          // (OptionalTimeRange's Optional[date] admits both) — and
          // NullNode.asText is the STRING "null", so it must be
          // filtered before it reaches the date parser. A bound may
          // also be the YearMonth OBJECT shape {year, month} or a bare
          // integer year — both appear in the reference's own request
          // fixtures (data/requests/monthly.json, yearly.json)
          def pt(name: String): Option[String] =
            Option(tr.get(name)).filterNot(_.isNull).map { n =>
              if (n.isObject) {
                // both fields required: a defaulted month could not be
                // right for both ends of a range (gte wants 1, lte 12),
                // and the fixture shape always carries it
                val y = intBound(n.get("year"), s"time_range.$name.year")
                val m = intBound(n.get("month"), s"time_range.$name.month")
                f"$y%04d-$m%02d"
              } else n.asText
            }
          // malformed date strings surface as a parse error at the wire
          // boundary (the reference's pydantic/int() validation layer);
          // containment errors pass through typed
          try Api.bandRangeForTimeRange(resolution, pt("gte"), pt("lte"))
          catch {
            case e @ (_: NumberFormatException | _: java.time.DateTimeException) =>
              throw RequestParseError(s"bad time_range date: ${e.getMessage}")
          }
        case None => availableBandsFor(resolution)
      }
    }
    // 0 ≤ max_processing_time ≤ the server budget, like the reference's
    // pydantic Field(ge=0, le=settings.max_processing_time)
    val maxMs = Option(root.get("max_processing_time")).map { n =>
      if (!n.isNumber) throw RequestParseError("max_processing_time must be a number")
      n.asLong
    }.getOrElse(MaxProcessingTimeMs)
    if (maxMs < 0 || maxMs > MaxProcessingTimeMs)
      throw RequestParseError(
        s"max_processing_time must be in [0, $MaxProcessingTimeMs]")
    TimeseriesRequest(
      datasetId = req("dataset_id").asText,
      variableId = Option(root.get("variable_id")).map(_.asText)
        .getOrElse("value"),
      selectedArea = parseGeometry(req("selected_area")),
      zonalStatistic = Option(root.get("zonal_statistic")).map(_.asText)
        .getOrElse("mean") match {
        case "mean" => ZonalMean
        case "median" => ZonalMedian
        case other => throw RequestParseError(s"unknown zonal_statistic $other")
      },
      transform = parseTransform(Option(root.get("transform"))),
      requestedSeriesOptions = parseSeries(Option(root.get("requested_series_options"))),
      bandRange = bandRange,
      resolution = resolution,
      maxProcessingTimeMs = maxMs)
  }

  /** v1 request body (TimeseriesV1Request, timeseries.py:276-325 +
    * data/requests/timeseriesv1.json): {datasetId, variableName,
    * boundaryGeometry, start, end} with start/end as integer years or
    * date strings ("2024" | "2024-02" | "2024-02-03"); absent bounds
    * normalize to the dataset edges. Returns the typed request plus the
    * raw geometry node, which the v1 RESPONSE echoes verbatim
    * (ResponseJson.toV1Json). */
  def parseV1(json: String): (TimeseriesRequest, JsonNode) = {
    val root =
      try mapper.readTree(json)
      catch { case e: Exception => throw RequestParseError(e.getMessage) }
    def req(name: String): JsonNode = {
      val n = root.get(name)
      if (n == null) throw RequestParseError(s"missing field $name")
      n
    }
    def bound(name: String): Option[String] =
      Option(root.get(name)).filterNot(_.isNull).map(_.asText)
    val geom = req("boundaryGeometry")
    val request = TimeseriesRequest(
      datasetId = req("datasetId").asText,
      // a JSON null is as absent as a missing key (and NullNode.asText
      // is the STRING "null" — it must not reach the variable lookup)
      variableId = Option(root.get("variableName")).filterNot(_.isNull)
        .map(_.asText).getOrElse("value"),
      selectedArea = parseGeometry(geom),
      bandRange =
        try (Api.bandForDate(bound("start"), Api.AvailableBands._1),
          Api.bandForDate(bound("end"), Api.AvailableBands._2))
        catch {
          case e @ (_: NumberFormatException | _: java.time.DateTimeException) =>
            throw RequestParseError(s"bad v1 start/end: ${e.getMessage}")
        })
    (request, geom)
  }

  /** GeoJSON geometry → SelectedArea (Point / Polygon / Feature /
    * FeatureCollection — geometry.py:61-225's accepted types). */
  def parseGeometry(g: JsonNode): SelectedArea = {
    def ring(coords: JsonNode): Seq[(Double, Double)] = {
      if (!coords.isArray) throw RequestParseError("polygon ring must be an array")
      (0 until coords.size).map { i =>
        val p = coords.get(i)
        (p.get(0).asDouble, p.get(1).asDouble)
      }
    }
    def polygonArea(geom: JsonNode): PolygonArea = {
      val cs = geom.get("coordinates")
      if (cs == null || !cs.isArray || cs.size < 1)
        throw RequestParseError("Polygon needs a coordinates array")
      // GeoJSON: first ring is the exterior, the rest are holes
      PolygonArea(ring(cs.get(0)), (1 until cs.size).map(i => ring(cs.get(i))))
    }
    Option(g.get("type")).map(_.asText) match {
      case Some("Point") =>
        val c = g.get("coordinates")
        if (c == null || c.size < 2) throw RequestParseError("Point needs [x, y]")
        val (px, py) = (c.get(0).asDouble, c.get(1).asDouble)
        // out-of-grid points must NOT silently alias onto a valid cell
        // (floor(-0.5) = -1 would wrap to the previous row's last
        // cell); bounds are the reference's rasterio index check
        val (cx, cy) = (math.floor(px).toLong, math.floor(py).toLong)
        if (cx < 0 || cx >= EventCube.GridWidth ||
            cy < 0 || cy >= graft.cube.Geometry.GridHeight)
          throw Api.SelectedAreaOutOfBoundsError(
            s"point ($px, $py) is outside the dataset region")
        PointArea(cy * EventCube.GridWidth + cx)
      case Some("Polygon") => polygonArea(g)
      case Some("Feature") =>
        val geom = g.get("geometry")
        if (geom == null) throw RequestParseError("Feature needs a geometry")
        parseGeometry(geom) match {
          case p: PolygonArea => p
          case p: PointArea => p
          case _ => throw RequestParseError("unsupported Feature geometry")
        }
      case Some("FeatureCollection") =>
        val fs = g.get("features")
        if (fs == null || !fs.isArray || fs.size == 0)
          throw RequestParseError("FeatureCollection needs features")
        // each feature keeps its FULL polygon — interior rings included
        // (dropping holes here would silently include hole cells the
        // identical geometry excludes when sent as a bare Polygon)
        FeatureCollectionArea((0 until fs.size).map { i =>
          val geom = fs.get(i).get("geometry")
          if (geom == null) throw RequestParseError("Feature needs a geometry")
          polygonArea(geom)
        })
      case other =>
        throw RequestParseError(s"unsupported geometry type $other")
    }
  }

  private def parseTransform(t: Option[JsonNode]): Transform = t match {
    case None => NoTransform
    case Some(n) => Option(n.get("type")).map(_.asText) match {
      case None | Some("NoTransform") => NoTransform
      case Some("ZScoreMovingInterval") =>
        ZScoreMovingInterval(Option(n.get("width")).map(_.asInt)
          .getOrElse(throw RequestParseError("ZScoreMovingInterval needs width")))
      case Some("ZScoreFixedInterval") =>
        // same [lo, hi] shape validation as the top-level band_range —
        // a scalar or short array must be a parse error, not an NPE
        ZScoreFixedInterval(Option(n.get("band_range"))
          .filterNot(_.isNull).map { br =>
            if (!br.isArray || br.size != 2)
              throw RequestParseError(
                "ZScoreFixedInterval band_range must be [lo, hi]")
            def ib(i: Int): Int = {
              val e = br.get(i)
              if (e == null || !e.canConvertToInt)
                throw RequestParseError(
                  s"ZScoreFixedInterval band_range[$i] must be an integer")
              e.asInt
            }
            (ib(0), ib(1))
          })
      case Some(other) => throw RequestParseError(s"unknown transform $other")
    }
  }

  private def parseSeries(s: Option[JsonNode]): Seq[SeriesOptions] = s match {
    case None => Seq(SeriesOptions("original", NoSmoother))
    case Some(arr) =>
      if (!arr.isArray || arr.size == 0)
        throw RequestParseError("requested_series_options must be a non-empty array")
      (0 until arr.size).map { i =>
        val n = arr.get(i)
        val name = Option(n.get("name")).map(_.asText)
          .getOrElse(throw RequestParseError("series option needs a name"))
        val sm = Option(n.get("smoother")).map { m =>
          Option(m.get("type")).map(_.asText) match {
            case None | Some("NoSmoother") => NoSmoother
            case Some("MovingAverageSmoother") =>
              val method = Option(m.get("method")).map(_.asText)
                .getOrElse(throw RequestParseError("smoother needs a method"))
              val width = Option(m.get("width")).map(_.asInt)
                .getOrElse(throw RequestParseError("smoother needs a width"))
              // schema validation parity (timeseries.py:83-97): method
              // is a closed enum, width ∈ [1, 200], and centered
              // windows must be odd — rejected HERE as a 422, not deep
              // in a window frame (batch) or silently computed with a
              // w+1-row window (serving fast path)
              if (method != "centered" && method != "trailing")
                throw RequestParseError(s"unknown smoother method $method")
              if (width < 1 || width > 200)
                throw RequestParseError("smoother width must be in [1, 200]")
              if (method == "centered" && width % 2 == 0)
                throw RequestParseError(
                  "window width must be odd for centered windows")
              MovingAverageSmoother(centered = method == "centered", width)
            case Some(other) => throw RequestParseError(s"unknown smoother $other")
          }
        }.getOrElse(NoSmoother)
        SeriesOptions(name, sm)
      }
  }
}
