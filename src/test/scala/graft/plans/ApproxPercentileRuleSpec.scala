package graft.plans

import graft.SparkSpec
import graft.cube.SkopeQueries

/** The exact→sketch percentile policy rule: flag off leaves plans
  * untouched (oracle parity), flag on reroutes every exact percentile
  * to the bounded-memory sketch without query changes. */
class ApproxPercentileRuleSpec extends SparkSpec {

  private def medianPlan(): String = {
    SkopeQueries.zonalMedian(spark, sfDir)
      .queryExecution.optimizedPlan.toString()
  }

  test("flag off: exact percentile stays (the oracle-checked default)") {
    ApproxPercentileRule.attach(spark)
    spark.conf.set("spark.graft.approxPercentile", "false")
    val plan = medianPlan()
    assert(plan.contains("percentile("), s"exact percentile missing: $plan")
    assert(!plan.contains("percentile_approx"), "rule fired while disabled")
  }

  test("flag on: every exact percentile reroutes to the sketch") {
    ApproxPercentileRule.attach(spark)
    spark.conf.set("spark.graft.approxPercentile", "true")
    try {
      val plan = medianPlan()
      assert(plan.contains("percentile_approx"),
        s"sketch rewrite missing: $plan")
      // the rewritten plan still computes a sane median
      val approx = SkopeQueries.zonalMedian(spark, sfDir)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      spark.conf.set("spark.graft.approxPercentile", "false")
      val exact = SkopeQueries.zonalMedian(spark, sfDir)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(approx.keySet === exact.keySet)
      // the sketch returns an actual data point (no interpolation), so
      // the right property is containment in the band's value range —
      // tiny groups make any fixed tolerance vs the interpolated exact
      // median wrong
      import org.apache.spark.sql.functions._
      val ranges = graft.cube.EventCube.cube(spark, sfDir, "click")
        .filter(graft.cube.EventCube.DefaultBBox.contains(col("x"), col("y")))
        .groupBy(col("band"))
        .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      approx.foreach { case (band, v) =>
        val (lo, hi) = ranges(band)
        assert(v >= lo - 1e-6 && v <= hi + 1e-6,
          s"band $band: sketch median $v outside value range [$lo, $hi]")
      }
    } finally spark.conf.set("spark.graft.approxPercentile", "false")
  }

  test("weighted percentiles are left on the exact path") {
    ApproxPercentileRule.attach(spark)
    spark.conf.set("spark.graft.approxPercentile", "true")
    try {
      import spark.implicits._
      val df = Seq((1.0, 2L), (3.0, 1L)).toDF("v", "w")
      df.createOrReplaceTempView("wp")
      val plan = spark.sql("SELECT percentile(v, 0.5, w) FROM wp")
        .queryExecution.optimizedPlan.toString()
      assert(plan.contains("percentile(") && !plan.contains("percentile_approx"),
        s"weighted percentile must not be rewritten: $plan")
    } finally spark.conf.set("spark.graft.approxPercentile", "false")
  }
}
