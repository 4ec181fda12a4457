package graft.cube

import java.time.LocalDate

import graft.SparkSpec
import graft.api.Api

/** Calendar-month band arithmetic vectors mirroring
  * dataset.py:64-88 (find_band_range month branch /
  * translate_band_range), including year crossings, plus the v1
  * "YYYY-MM" parsing path through the Monthly cube. */
class MonthArithmeticSpec extends SparkSpec {

  private def band(date: String, origin: String): Int =
    EventCube.monthBandOf(LocalDate.parse(date), LocalDate.parse(origin))

  test("replay test_stores.py band-range conversion vectors") {
    // tests/test_stores.py:22-47 — band ranges are relative to the
    // DATASET's own availability start, not a global origin. Yearly
    // dataset available 0007-01-01..0020-01-01: [0007, 0010] → bands
    // [1, 4]; monthly dataset available 0013-05-01..0023-04-01:
    // [0015-05, 0023-04] → bands [25, 120]; translate_band_range
    // inverts band 1 → the availability gte and band 120 → its lte.
    def yband(d: String, o: String): Int =
      EventCube.yearBandOf(LocalDate.parse(d), LocalDate.parse(o))
    assert(yband("0007-01-01", "0007-01-01") === 1)
    assert(yband("0010-01-01", "0007-01-01") === 4)
    assert(band("0015-05-01", "0013-05-01") === 25)
    assert(band("0023-04-01", "0013-05-01") === 120)
    // the translate-back inverse (dataset.py translate_band_range):
    // band b starts (b−1) whole units after the availability gte, and
    // feeding that start date back through the ENGINE's band arithmetic
    // must recover b — the round-trip property over the vector bands,
    // driven through monthBandOf/yearBandOf, not the JDK alone
    Seq(1, 4, 14).foreach { b =>
      val start = LocalDate.parse("0007-01-01").plusYears(b - 1)
      assert(yband(start.toString, "0007-01-01") === b,
        s"year band $b round trip")
    }
    Seq(1, 25, 120).foreach { b =>
      val start = LocalDate.parse("0013-05-01").plusMonths(b - 1)
      assert(band(start.toString, "0013-05-01") === b,
        s"month band $b round trip")
    }
  }

  test("month band indexing matches relativedelta arithmetic") {
    // same month → band 1 (1-based)
    assert(band("2024-01-01", "2024-01-01") === 1)
    assert(band("2024-01-31", "2024-01-01") === 1)
    // within-year steps
    assert(band("2024-02-01", "2024-01-01") === 2)
    assert(band("2024-12-15", "2024-01-01") === 12)
    // year crossings (the relativedelta years*12 + months branch)
    assert(band("2025-01-01", "2024-01-01") === 13)
    assert(band("2024-02-10", "2023-11-01") === 4)
    assert(band("2026-03-01", "2023-11-01") === 29)
    // origin later in the year than the date's month-of-year
    assert(band("2025-01-01", "2024-11-01") === 3)
    // mid-month origins: relativedelta counts WHOLE months — the band
    // ticks at the origin's day-of-month, clamped to the month length
    // (vectors cross-checked against dateutil.relativedelta)
    assert(band("2024-02-10", "2024-01-20") === 1) // 21 days < 1 month
    assert(band("2024-02-20", "2024-01-20") === 2)
    assert(band("2024-02-29", "2024-01-31") === 2) // clamped anniversary
    assert(band("2024-03-30", "2024-01-31") === 2)
    assert(band("2024-03-31", "2024-01-31") === 3)
    assert(band("2024-02-28", "2023-01-31") === 13)
  }

  test("v1 month string parsing feeds the month band arithmetic") {
    assert(Api.bandForMonth(Some("2024"), 99) === 1)
    assert(Api.bandForMonth(Some("2024-01"), 99) === 1)
    assert(Api.bandForMonth(Some("2024-01-20"), 99) === 1)
    assert(Api.bandForMonth(None, 7) === 7)
  }

  test("monthly v1 request extracts through the Monthly cube axis") {
    val req = Api.v1MonthlyRequest("click", 2L, Some("2024-01"), Some("2024-01"))
    assert(req.bandRange === (1, 1))
    val res = Api.extractTimeseries(spark, sfDir, req)
    val rows = res.series.collect()
    assert(rows.length === 1, "January corpus = exactly one month band")
    assert(rows.head.getLong(1) === 1L)
  }

  test("monthly band range outside the axis is rejected") {
    intercept[Api.TimeRangeContainmentError] {
      Api.extractTimeseries(spark, sfDir,
        Api.v1MonthlyRequest("click", 2L, Some("2024-03"), Some("2024-04")))
    }
  }

  test("band start dates invert the band index (translate_band_range)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1, 15).select(
      col("id").as("band"),
      date_format(EventCube.Monthly.bandStart(col("id")), "yyyy-MM-dd").as("d"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "2024-01-01")
    assert(got(12L) === "2024-12-01")
    assert(got(13L) === "2025-01-01") // year crossing on the inverse too
  }

  test("variable k extracts as a first-class series distinct from value") {
    val base = Api.TimeseriesRequest(
      datasetId = "click",
      selectedArea = Api.BBoxArea(0, 9, 0, 9),
      bandRange = (1, 31))
    val v = Api.extractTimeseries(spark, sfDir, base)
      .series.collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val k = Api.extractTimeseries(spark, sfDir, base.copy(variableId = "k"))
      .series.collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(k.nonEmpty && v.nonEmpty)
    assert(k.keySet === v.keySet, "same band axis for both variables")
    assert(k !== v, "k is a different raster than value")
  }
}
