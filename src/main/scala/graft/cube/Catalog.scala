package graft.cube

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Static dataset catalog — the engine-side model of the fields the
  * reference serves from `metadata.yml` (load_api_metadata,
  * dataset.py:142-154): title, timespan (resolution + period gte/lte +
  * timeZero era label), region extents, and the uncertainty slot. The
  * reference's band count comes from this timespan, NOT from scanning
  * the rasters (dataset.py:34-41 builds the Dataset from the yml), so
  * `skope_metadata`'s n_bands is derived here too — a dataset with
  * absent bands still reports its declared extent.
  *
  * At 100 TB the catalog is a dozen rows per lake: always a broadcast
  * side, never a shuffle.
  */
object Catalog {

  /** One metadata.yml document (the served subset). `timeZero` is the
    * era label of band 1 at year resolution (metadata.yml
    * `timespan.period.timeZero` — lbda_v2 pairs `timeZero: 1` with
    * gte '0001', so label = timeZero + band − 1). */
  final case class Entry(
      id: String,
      title: String,
      resolution: String,
      timeGte: String,
      timeLte: String,
      timeZero: Int,
      uncertainty: String)

  /** The synthetic corpus's five datasets: day-resolution January 2024,
    * era anchored at 2024 (so the year-resolution view of the same span
    * labels band 1 as 2024, exercising the timeZero + band − 1
    * arithmetic with a non-unity era offset). */
  val entries: Seq[Entry] = Seq("click", "view", "purchase", "signup", "error")
    .map { id =>
      Entry(
        id = id,
        title = s"Synthetic $id events (grid-cell daily cube)",
        resolution = "day",
        timeGte = "2024-01-01",
        timeLte = "2024-01-31",
        timeZero = 2024,
        uncertainty = "synthetic corpus: no uncertainty raster")
    }

  /** Region extents shared by every dataset: the documented
    * geo-transform (1° cells from 50°N / −120°E — Geometry.Geo) over
    * the GridWidth × GridHeight cell grid, as (latMin, latMax, lonMin,
    * lonMax) like metadata.yml's `region.extents` corner pairs. */
  val LatMax: Double = Geometry.Geo.UlLat
  val LatMin: Double = Geometry.Geo.UlLat - Geometry.GridHeight
  val LonMin: Double = Geometry.Geo.UlLon
  val LonMax: Double = Geometry.Geo.UlLon + EventCube.GridWidth

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

  /** The catalog as a (broadcastable) DataFrame. */
  def table(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.map { e =>
      (e.id, e.title, e.resolution, e.timeGte, e.timeLte,
        e.timeZero.toLong, nBands(e).toLong, e.uncertainty,
        LatMin, LatMax, LonMin, LonMax)
    }.toDF("dataset_id", "title", "resolution", "time_gte", "time_lte",
      "time_zero", "n_bands", "uncertainty",
      "lat_min", "lat_max", "lon_min", "lon_max")
  }

  /** The same catalog as a DuckDB VALUES list — generated from the SAME
    * `entries`, so the oracle and the engine share one source of
    * truth. */
  def tableSql: String = {
    val rows = entries.map { e =>
      s"('${e.id}', '${e.title}', '${e.resolution}', '${e.timeGte}', " +
        s"'${e.timeLte}', CAST(${e.timeZero} AS BIGINT), " +
        s"CAST(${nBands(e)} AS BIGINT), '${e.uncertainty}', " +
        s"CAST($LatMin AS DOUBLE), CAST($LatMax AS DOUBLE), " +
        s"CAST($LonMin AS DOUBLE), CAST($LonMax AS DOUBLE))"
    }.mkString(",\n    ")
    s"""(SELECT * FROM (VALUES
       |    $rows)
       |  AS t(dataset_id, title, resolution, time_gte, time_lte,
       |       time_zero, n_bands, uncertainty,
       |       lat_min, lat_max, lon_min, lon_max))""".stripMargin
  }
}
