package graft.cube

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType,
  StringType, StructField, StructType}

/** Static dataset catalog — the engine-side model of the fields the
  * reference serves from `metadata.yml` (load_api_metadata,
  * dataset.py:142-154 returns the yml documents VERBATIM): title,
  * description, method summary, references, originator, status,
  * revision date, ordering, timespan (resolution + resolutionLabel +
  * period gte/lte + timeZero era label + era suffix), region (name,
  * zoom, center, style, extents), and the uncertainty slot. The
  * reference's band count comes from this timespan, NOT from scanning
  * the rasters (dataset.py:34-41 builds the Dataset from the yml), so
  * `skope_metadata`'s n_bands is derived here too — a dataset with
  * absent bands still reports its declared extent.
  *
  * At 100 TB the catalog is a dozen rows per lake: always a broadcast
  * side, never a shuffle.
  */
object Catalog {

  /** One metadata.yml document (the full served field set —
    * metadata.yml:1-60). `timeZero` is the era label of band 1 at year
    * resolution (metadata.yml `timespan.period.timeZero` — lbda_v2
    * pairs `timeZero: 1` with gte '0001', so label = timeZero +
    * band − 1); `eraSuffix` is the period's display suffix ("CE"). */
  final case class Entry(
      id: String,
      title: String,
      resolution: String,
      timeGte: String,
      timeLte: String,
      timeZero: Int,
      uncertainty: String,
      ordering: Int = 0,
      description: String = "",
      status: String = "Published",
      revised: String = "2024-02-01",
      resolutionLabel: String = "",
      eraSuffix: String = "CE",
      methodSummary: String = "",
      references: String = "",
      originator: String = "")

  /** The synthetic corpus's five datasets: day-resolution January 2024,
    * era anchored at 2024 (so the year-resolution view of the same span
    * labels band 1 as 2024, exercising the timeZero + band − 1
    * arithmetic with a non-unity era offset). The description carries a
    * deliberate apostrophe: the DuckDB VALUES emission must survive
    * quote-bearing catalog text (tableSql escaping). */
  val entries: Seq[Entry] = Seq("click", "view", "purchase", "signup", "error")
    .zipWithIndex.map { case (id, i) =>
      Entry(
        id = id,
        title = s"Synthetic $id events (grid-cell daily cube)",
        resolution = "day",
        timeGte = "2024-01-01",
        timeLte = "2024-01-31",
        timeZero = 2024,
        uncertainty = "synthetic corpus: no uncertainty raster",
        ordering = (i + 1) * 10,
        description = s"Daily $id counts over the corpus's synthetic " +
          "10-degree grid, January 2024.",
        status = "Published",
        revised = "2024-02-01",
        resolutionLabel = "daily",
        eraSuffix = "CE",
        methodSummary = s"Events of type '$id' aggregated to one value " +
          "per (grid cell, day) by mean.",
        references = "Synthetic corpus; no external publication.",
        originator = "graft synthetic generator")
    }

  /** One metadata.yml variable document (metadata.yml:77-93 — the
    * fields a metadata-browser client reads per variable; `units` is
    * nullable in the yml, `min`/`max` are the display range,
    * `timeseriesServiceUri` is the dataset/variable route the
    * timeseries endpoint serves). */
  final case class Variable(
      id: String,
      clazz: String,
      name: String,
      units: Option[String],
      min: Double,
      max: Double,
      visible: Boolean,
      styles: String,
      description: String)

  /** The two variables every synthetic dataset carries: the raw event
    * `value` and the props-derived `k` (the second-raster analogue —
    * see SkopeQueries.DatasetVariables). */
  def variables(datasetId: String): Seq[Variable] = Seq(
    Variable(
      id = "value",
      clazz = "Synthetic",
      name = s"Mean $datasetId event value",
      units = None,
      min = 0.0, max = 100.0,
      visible = true,
      styles = "default",
      description = s"Per-cell daily mean of the $datasetId events' " +
        "value field."),
    Variable(
      id = "k",
      clazz = "Synthetic",
      name = s"Mean $datasetId props k",
      units = None,
      min = 0.0, max = 10.0,
      visible = false,
      styles = "default",
      description = s"Per-cell daily mean of the $datasetId events' " +
        "props-embedded k counter."))

  /** timeseriesServiceUri mirrors the reference's
    * '<dataset>/<variable>' route template (metadata.yml:86). */
  def timeseriesServiceUri(datasetId: String, variableId: String): String =
    s"$datasetId/$variableId"

  /** Runtime catalog: the reference loads `metadata.yml` at startup
    * (app/main.py); here `SPARK_GRAFT_CATALOG` names a yml file to
    * serve instead of the static synthetic catalog — adding a dataset
    * becomes a yml edit, not a recompile. Resolved once per JVM; the
    * engine frame, the DuckDB oracle VALUES, AND the /metadata JSON all
    * derive from the SAME loaded entries, so an override cannot drift
    * the correctness gate. */
  private lazy val runtime: Option[(Seq[Entry], Map[String, Seq[Variable]])] =
    sys.env.get("SPARK_GRAFT_CATALOG").map(CatalogYaml.load)

  /** The catalog in effect (yml-loaded or static). */
  def activeEntries: Seq[Entry] = runtime.map(_._1).getOrElse(entries)

  /** Variables of the catalog in effect: a yml catalog serves ONLY its
    * own declared variables (absent list → none, like the reference's
    * Dataset model); the static catalog keeps its synthetic pair. */
  def activeVariables(datasetId: String): Seq[Variable] = runtime match {
    case Some((_, vs)) => vs.getOrElse(datasetId, Seq.empty)
    case None => variables(datasetId)
  }

  /** Region fields shared by every dataset (metadata.yml `region`):
    * extents are the documented geo-transform (1° cells from 50°N /
    * −120°E — Geometry.Geo) over the GridWidth × GridHeight cell grid,
    * as (latMin, latMax, lonMin, lonMax) corner pairs; zoom/center/
    * style are the map-display hints the reference serves alongside. */
  val LatMax: Double = Geometry.Geo.UlLat
  val LatMin: Double = Geometry.Geo.UlLat - Geometry.GridHeight
  val LonMin: Double = Geometry.Geo.UlLon
  val LonMax: Double = Geometry.Geo.UlLon + EventCube.GridWidth
  val RegionName = "Synthetic grid"
  val RegionZoom = 4
  val RegionCenterLat: Double = (LatMin + LatMax) / 2
  val RegionCenterLon: Double = (LonMin + LonMax) / 2
  val RegionStyleColor = "blue"
  val RegionStyleWeight = 2

  /** Timespan-derived band count at the entry's declared resolution —
    * the reference's BandRange over [gte, lte] (find_band_range against
    * its own bounds: 1 .. bands-between + 1). */
  def nBands(e: Entry): Int = {
    val gte = java.time.LocalDate.parse(e.timeGte)
    val lte = java.time.LocalDate.parse(e.timeLte)
    e.resolution match {
      case "day" =>
        java.time.temporal.ChronoUnit.DAYS.between(gte, lte).toInt + 1
      case "month" => EventCube.monthBandOf(lte, gte)
      case "year" => EventCube.yearBandOf(lte, gte)
      case other =>
        throw new IllegalArgumentException(s"unknown resolution $other")
    }
  }

  /** (name, type) column layout shared by [[table]] and [[tableSql]] —
    * one source of truth so the engine frame and the oracle VALUES list
    * cannot drift. */
  private val columns: Seq[(String, DataType)] = Seq(
    "dataset_id" -> StringType, "title" -> StringType,
    "ordering" -> LongType, "description" -> StringType,
    "status" -> StringType, "revised" -> StringType,
    "resolution" -> StringType, "resolution_label" -> StringType,
    "time_gte" -> StringType, "time_lte" -> StringType,
    "time_zero" -> LongType, "era_suffix" -> StringType,
    "n_bands" -> LongType, "uncertainty" -> StringType,
    "method_summary" -> StringType, "references" -> StringType,
    "originator" -> StringType,
    "lat_min" -> DoubleType, "lat_max" -> DoubleType,
    "lon_min" -> DoubleType, "lon_max" -> DoubleType,
    "region_name" -> StringType, "region_zoom" -> LongType,
    "region_center_lat" -> DoubleType, "region_center_lon" -> DoubleType,
    "region_style_color" -> StringType, "region_style_weight" -> LongType)

  private def values(e: Entry): Seq[Any] = Seq(
    e.id, e.title, e.ordering.toLong, e.description,
    e.status, e.revised, e.resolution, e.resolutionLabel,
    e.timeGte, e.timeLte, e.timeZero.toLong, e.eraSuffix,
    nBands(e).toLong, e.uncertainty,
    e.methodSummary, e.references, e.originator,
    LatMin, LatMax, LonMin, LonMax,
    RegionName, RegionZoom.toLong,
    RegionCenterLat, RegionCenterLon,
    RegionStyleColor, RegionStyleWeight.toLong)

  /** The catalog as a (broadcastable) DataFrame — built as a
    * LocalRelation (list overload), NOT an RDD: a LogicalRDD carries
    * the default (huge) size estimate, so an un-hinted future join
    * against the 5-row catalog would plan a sort-merge shuffle. */
  def table(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(columns.map { case (n, t) =>
      StructField(n, t, nullable = false) })
    val rows = activeEntries.map(e => Row.fromSeq(values(e))).asJava
    spark.createDataFrame(rows, schema)
  }

  /** SQL single-quoted string literal with embedded quotes doubled —
    * catalog text is free-form prose and may contain apostrophes. */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The same catalog as a DuckDB VALUES list — generated from the SAME
    * `entries` via the SAME column layout, so the oracle and the engine
    * share one source of truth. (`references` is a reserved word —
    * every alias is double-quoted.) */
  def tableSql: String = {
    val rows = activeEntries.map { e =>
      values(e).map {
        case s: String => sqlLit(s)
        case l: Long => s"CAST($l AS BIGINT)"
        case d: Double => s"CAST($d AS DOUBLE)"
        case other => other.toString
      }.mkString("(", ", ", ")")
    }.mkString(",\n    ")
    val aliases = columns.map { case (n, _) => "\"" + n + "\"" }
      .mkString(", ")
    s"""(SELECT * FROM (VALUES
       |    $rows)
       |  AS t($aliases))""".stripMargin
  }
}
