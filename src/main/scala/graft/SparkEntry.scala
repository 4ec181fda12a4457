package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cube.SkopeQueries
import graft.pipeline.{Curation, Dedup, EventOps, Multimodal, Similarity, TextAnalysis, TrainingPrep}
import graft.relational.TpchQueries

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship: the full reference pipeline through the typed API —
    * bbox selection → zonal mean → moving z-score → trailing smoother →
    * clip (driver smoke-checks rows>0 on /root/testdata/sf0.001). */
  def entry(spark: SparkSession): DataFrame = {
    import graft.api.Api._
    extractTimeseries(spark, "/root/testdata/sf0.001", TimeseriesRequest(
      datasetId = "click",
      selectedArea = BBoxArea(0, 9, 0, 9),
      transform = ZScoreMovingInterval(6),
      requestedSeriesOptions = Seq(
        SeriesOptions("original", NoSmoother),
        SeriesOptions("smoothed", MovingAverageSmoother(centered = false, 3))),
      bandRange = (10, 28))).series
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> (TpchQueries.q1 _),
    "q3_shipping" -> (TpchQueries.q3 _),
    "q4_priority" -> (TpchQueries.q4 _),
    "q5_region_rev" -> (TpchQueries.q5 _),
    "q6_forecast" -> (TpchQueries.q6 _),
    "q7_volume" -> (TpchQueries.q7 _),
    "q10_returns" -> (TpchQueries.q10 _),
    "q14_promo" -> (TpchQueries.q14 _),
    "q16_parts_suppliers" -> (TpchQueries.q16 _),
    "q18_large_cust" -> (TpchQueries.q18 _),
    "q19_brand_disc" -> (TpchQueries.q19 _),
    "q22_idle_cust" -> (TpchQueries.q22 _),
    "q13_custdist" -> (TpchQueries.q13 _),
    "q15_top_supplier" -> (TpchQueries.q15 _),
    "q8_market_share" -> (TpchQueries.q8 _),
    "q17_small_qty" -> (TpchQueries.q17 _),
    "q2_min_cost_supp" -> (TpchQueries.q2 _),
    "q11_important_stock" -> (TpchQueries.q11 _),
    "q9_product_profit" -> (TpchQueries.q9 _),
    "q12_ship_class" -> (TpchQueries.q12 _),
    "q20_excess_supp" -> (TpchQueries.q20 _),
    "q21_wait_supp" -> (TpchQueries.q21 _)
  ) ++ SkopeQueries.queries ++ TextAnalysis.queries ++ Dedup.queries ++
    Similarity.queries ++ Multimodal.queries ++ EventOps.queries ++
    Curation.queries ++ TrainingPrep.queries ++ graft.pipeline.Bpe.queries ++
    graft.pipeline.QualityClf.queries ++ graft.pipeline.LangIdClf.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TpchQueries.oracles ++ SkopeQueries.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++
      EventOps.oracles ++ Curation.oracles ++ TrainingPrep.oracles ++
      graft.pipeline.Bpe.oracles ++ graft.pipeline.QualityClf.oracles ++ graft.pipeline.LangIdClf.oracles
}
