package graft.cube

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Moving-average smoothers over a (band, zv) series — the Spark
  * re-expression of MovingAverageSmoother
  * (reference: timeseries/app/schemas/timeseries.py:81-124).
  *
  * The reference widens the extracted band range by the smoother's
  * "desired band range adjustment" and then clips back, so only values
  * whose full window exists are emitted
  * (timeseries.py:402-431, verified against
  * tests/routers/test_datasets.py:test_annual_different_smoothers).
  * Here the same semantics fall out of a window frame + a
  * full-window count guard, then the band-range clip filter.
  *
  * Scale: windows are per-series; `partitionBy` on the series keys means
  * one series never crosses executors — for millions of concurrent
  * series this parallelizes with a single shuffle on the series key.
  */
object Smoothers {

  private def series(partition: Seq[String]) = {
    // constant-valued key for the single-series path (see
    // Transforms.zscoreMoving for why pmod(band, 1), not lit(0)): one
    // bounded partition either way, but declared, so the plan carries a
    // partition spec and the WindowExec single-partition warning never fires
    if (partition.isEmpty) Window.partitionBy(pmod(col("band"), lit(1))).orderBy("band")
    else Window.partitionBy(partition.map(col): _*).orderBy("band")
  }

  /** Centered MA, odd width: value at t = mean over [t-w/2, t+w/2],
    * emitted only when the full window exists (timeseries.py:100-112).
    */
  def maCentered(s: DataFrame, width: Int,
      partition: Seq[String] = Nil): DataFrame = {
    require(width % 2 == 1, "window width must be odd for centered windows")
    val k = width / 2
    val w = series(partition).rowsBetween(-k, k)
    s.withColumn("sm", avg(col("zv")).over(w))
      .withColumn("n_win", count(lit(1)).over(w))
      .filter(col("n_win") === width)
      .drop("n_win", "zv").withColumnRenamed("sm", "zv")
  }

  /** Trailing MA: value at t = mean of the `width` values strictly
    * before t (band adjustment [-w, 0] + convolve 'valid' labeling,
    * timeseries.py:100-112 + test_datasets.py trailing case).
    */
  def maTrailing(s: DataFrame, width: Int,
      partition: Seq[String] = Nil): DataFrame = {
    val w = series(partition).rowsBetween(-width, -1)
    s.withColumn("sm", avg(col("zv")).over(w))
      .withColumn("n_win", count(lit(1)).over(w))
      .filter(col("n_win") === width)
      .drop("n_win", "zv").withColumnRenamed("sm", "zv")
  }

  /** Oracle fragments (DuckDB) on a `zonal(band, zv)` CTE. */
  def maCenteredSql(width: Int): String = {
    val k = width / 2
    s"""SELECT band, sm AS zv FROM (
       |  SELECT band,
       |    avg(zv) OVER (ORDER BY band ROWS BETWEEN $k PRECEDING AND $k FOLLOWING) AS sm,
       |    count(*) OVER (ORDER BY band ROWS BETWEEN $k PRECEDING AND $k FOLLOWING) AS n_win
       |  FROM zonal) t WHERE n_win = $width""".stripMargin
  }

  def maTrailingSql(width: Int): String =
    s"""SELECT band, sm AS zv FROM (
       |  SELECT band,
       |    avg(zv) OVER (ORDER BY band ROWS BETWEEN $width PRECEDING AND 1 PRECEDING) AS sm,
       |    count(*) OVER (ORDER BY band ROWS BETWEEN $width PRECEDING AND 1 PRECEDING) AS n_win
       |  FROM zonal) t WHERE n_win = $width""".stripMargin
}
