package graft.cube

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Smoother/transform semantics pinned to the reference's own test
  * vectors (timeseries/app/tests/routers/test_datasets.py).
  */
class SmootherSpec extends SparkSpec {

  private def series(vals: Seq[Double]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) => (i + 1L, v) }.toDF("band", "zv")
  }

  private def values(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.orderBy("band").collect().toSeq
      .map(r => (r.getLong(0), r.getDouble(1)))

  // test_moving_average_smoother: xs=[1×5, 2×5], centered width 3
  test("centered MA matches reference numpy convolve 'valid'") {
    val xs = Seq(1.0, 1, 1, 1, 1, 2, 2, 2, 2, 2)
    val out = values(Smoothers.maCentered(series(xs), 3).select("band", "zv"))
    val expected = Seq(1.0, 1, 1, 4.0 / 3, 5.0 / 3, 2, 2, 2)
    assert(out.size == xs.size - 2)
    // centered width 3 drops one band at each edge: bands 2..9
    assert(out.map(_._1) == (2L to 9L))
    out.map(_._2).zip(expected).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-12)
    }
  }

  // test_annual_different_smoothers: trailing width 2 over years 1..5
  // yields values labeled from band 3 = mean(x1, x2)
  test("trailing MA labels value at t with mean of the w bands before t") {
    val out = values(Smoothers.maTrailing(series(Seq(10.0, 20, 30, 40, 50)), 2))
    assert(out == Seq((3L, 15.0), (4L, 25.0), (5L, 35.0)))
  }

  test("rolling z-score excludes current band, NULL-safe on zero std") {
    val out = Transforms.zscoreMoving(series(Seq(1.0, 3, 2, 5, 4, 6)), 2)
    val rows = out.orderBy("band").collect()
    // band 3: (2 - mean(1,3)) / std_pop(1,3) = 0/1 = 0
    // band 4: (5 - mean(3,2)) / std_pop(3,2) = 2.5/0.5 = 5
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L, 4L, 5L, 6L))
    assert(math.abs(rows(0).getDouble(1) - 0.0) < 1e-12)
    assert(math.abs(rows(1).getDouble(1) - 5.0) < 1e-12)
  }

  test("zero stddev in rolling window yields NULL like the reference NaN") {
    val out = Transforms.zscoreMoving(series(Seq(2.0, 2, 7)), 2)
    val rows = out.orderBy("band").collect()
    assert(rows.length == 1 && rows(0).isNullAt(1))
  }

  test("fixed-interval z-score standardizes against reference stats") {
    val s = series(Seq(1.0, 2, 3, 4, 5))
    val out = values(Transforms.zscoreFixed(s, s.filter(col("band") <= 3)))
    // ref mean=2, std_pop=sqrt(2/3)
    val sd = math.sqrt(2.0 / 3)
    out.foreach { case (b, z) =>
      assert(math.abs(z - (b - 2.0) / sd) < 1e-12)
    }
  }
}
