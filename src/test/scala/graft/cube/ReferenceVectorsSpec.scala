package graft.cube

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Replicates the reference's OWN unit-test vectors
  * (timeseries/app/tests/routers/test_datasets.py) against graft's
  * smoothers — the directest evidence that the band-arithmetic
  * semantics match, not just the DuckDB oracle's re-derivation.
  */
class ReferenceVectorsSpec extends SparkSpec {

  private def series(vals: Seq[(Long, Double)]) = {
    val s = spark
    import s.implicits._
    vals.toDF("band", "zv")
  }

  private def collectSeries(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.orderBy("band").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("centered MA reproduces test_moving_average_smoother exactly") {
    // reference: xs = [1,1,1,1,1,2,2,2,2,2], centered width 3
    //   -> [1, 1, 1, 4/3, 5/3, 2, 2, 2], length n - 2
    val xs = Seq(1.0, 1, 1, 1, 1, 2, 2, 2, 2, 2)
    val in = series(xs.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v) })
    val out = collectSeries(Smoothers.maCentered(in, 3))
    val expected = Seq(1.0, 1, 1, 4.0 / 3, 5.0 / 3, 2, 2, 2)
    assert(out.map(_._1) == (2L to 9L))
    out.map(_._2).zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-9, s"got $got want $want")
    }
  }

  test("rolling z-score matches the reference formula (timeseries.py:34-42)") {
    // z_t = (x_t - nanmean(x_{t-w..t-1})) / nanstd_pop(...), width 3:
    //   band 4 (x=4):  mean(1,2,3)=2, std_pop=sqrt(2/3) -> 2.449489...
    //   band 5 (x=10): mean(2,3,4)=3, std_pop=sqrt(2/3) -> 8.573214...
    val in = series(Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0, 5L -> 10.0))
    val out = collectSeries(Transforms.zscoreMoving(in, 3))
    val sd = math.sqrt(2.0 / 3.0)
    assert(out.map(_._1) == Seq(4L, 5L))
    assert(math.abs(out(0)._2 - 2.0 / sd) < 1e-9)
    assert(math.abs(out(1)._2 - 7.0 / sd) < 1e-9)
  }

  test("rolling z-score emits null when the window std is 0") {
    // reference: np.nan when s == 0 — a constant window must not divide
    val in = series(Seq(1L -> 5.0, 2L -> 5.0, 3L -> 5.0, 4L -> 7.0))
    val rows = Transforms.zscoreMoving(in, 3).orderBy("band").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(4L))
    assert(rows.head.isNullAt(1), "std=0 window must yield null, not infinity")
  }

  test("smoother band ranges reproduce test_annual_different_smoothers") {
    // reference: 5 annual bands, requested range 1..4.
    //   original -> bands 1..4
    //   trailing width 2 -> bands 3..4 only (band 2's window needs the
    //     nonexistent band 0)
    //   centered width 3 -> bands 2..4, with band 4's window REACHING
    //     OUTSIDE the requested range into band 5 (widen-then-clip)
    val in = series(Seq(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0, 5L -> 50.0))
    def clip(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("band").between(1, 4))

    val original = collectSeries(clip(in))
    assert(original.map(_._1) == (1L to 4L))

    val trailing = collectSeries(clip(Smoothers.maTrailing(in, 2)))
    assert(trailing == Seq(3L -> 15.0, 4L -> 25.0))

    val centered = collectSeries(clip(Smoothers.maCentered(in, 3)))
    assert(centered == Seq(2L -> 20.0, 3L -> 30.0, 4L -> 40.0),
      "band 4 must average bands 3..5 — the window widens past the clip")
  }
}
