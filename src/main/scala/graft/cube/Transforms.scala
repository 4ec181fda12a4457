package graft.cube

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-score transforms over a (band, zv) series — Spark re-expression of
  * ZScoreMovingInterval / ZScoreFixedInterval
  * (reference: timeseries/app/schemas/timeseries.py:127-176).
  */
object Transforms {

  /** Rolling z-score: z_t = (x_t − mean(x_{t−w..t−1})) / std_pop(…),
    * NULL when std = 0 or the trailing window is incomplete
    * (rolling_z_score, timeseries.py:34-42: window excludes current).
    */
  def zscoreMoving(s: DataFrame, width: Int,
      partition: Seq[String] = Nil): DataFrame = {
    // single-series callers pass no key: partition by a constant-valued
    // key rather than leaving the spec empty — same one-partition layout
    // (the series is #bands rows, bounded by the request), but the plan
    // declares it and WindowExec's single-partition warning never fires.
    // pmod(band, 1) and not lit(0): EliminateWindowPartitions strips
    // foldable partition expressions (and `band * 0` is simplified
    // too), re-emptying the spec; the pmod form survives optimization
    val base = if (partition.isEmpty)
                 Window.partitionBy(pmod(col("band"), lit(1))).orderBy("band")
               else Window.partitionBy(partition.map(col): _*).orderBy("band")
    val w = base.rowsBetween(-width, -1)
    s.withColumn("m", avg(col("zv")).over(w))
      .withColumn("sd", stddev_pop(col("zv")).over(w))
      .withColumn("n_win", count(lit(1)).over(w))
      .filter(col("n_win") === width)
      .withColumn("z", (col("zv") - col("m")) / nullif(col("sd"), lit(0.0)))
      .select((partition.map(col) :+ col("band") :+ col("z").as("zv")): _*)
  }

  /** Fixed-interval z-score: z = (x − mean_ref) / std_pop_ref where the
    * reference stats come from `ref` (a fixed band interval's series, or
    * the selection itself — timeseries.py:153-173). Implemented as a
    * broadcast of the 1-row stats — no second shuffle.
    */
  def zscoreFixed(s: DataFrame, ref: DataFrame): DataFrame = {
    val stats = ref.agg(
      avg(col("zv")).as("m_ref"), stddev_pop(col("zv")).as("sd_ref"))
    s.crossJoin(broadcast(stats))
      .withColumn("z", (col("zv") - col("m_ref")) / nullif(col("sd_ref"), lit(0.0)))
      .select(col("band"), col("z").as("zv"))
  }

  /** Batched fixed-interval z-score: per-key reference stats joined
    * back (broadcast — one row per selection), so a batch of thousands
    * of selections stays one distributed plan with no per-selection
    * driver loop. */
  def zscoreFixedBatch(s: DataFrame, ref: DataFrame,
      keys: Seq[String]): DataFrame = {
    val stats = ref.groupBy(keys.map(col): _*).agg(
      avg(col("zv")).as("m_ref"), stddev_pop(col("zv")).as("sd_ref"))
    s.join(broadcast(stats), keys)
      .withColumn("z", (col("zv") - col("m_ref")) / nullif(col("sd_ref"), lit(0.0)))
      .select((keys.map(col) :+ col("band") :+ col("z").as("zv")): _*)
  }

  def zscoreMovingSql(width: Int): String =
    s"""SELECT band, (zv - m) / nullif(sd, 0) AS zv FROM (
       |  SELECT band, zv,
       |    avg(zv) OVER (ORDER BY band ROWS BETWEEN $width PRECEDING AND 1 PRECEDING) AS m,
       |    stddev_pop(zv) OVER (ORDER BY band ROWS BETWEEN $width PRECEDING AND 1 PRECEDING) AS sd,
       |    count(*) OVER (ORDER BY band ROWS BETWEEN $width PRECEDING AND 1 PRECEDING) AS n_win
       |  FROM zonal) t WHERE n_win = $width""".stripMargin

  /** Oracle: z-score vs the stats of `refWhere`-selected bands. */
  def zscoreFixedSql(refWhere: String): String =
    s"""SELECT band, (zv - m_ref) / nullif(sd_ref, 0) AS zv
       |FROM zonal CROSS JOIN (
       |  SELECT avg(zv) AS m_ref, stddev_pop(zv) AS sd_ref
       |  FROM zonal WHERE $refWhere) refstats""".stripMargin
}
