package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def purchases = Tables.events(spark, sfDir)
    .filter(col("event_type") === "purchase")
    .select(col("event_id"), col("user_id"), col("ts"), col("value"))

  private def clicks = Tables.events(spark, sfDir)
    .filter(col("event_type") === "click")
    .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
      col("ts").as("c_ts"), col("value").as("click_value"))

  private def custom: DataFrame =
    AsofJoin.asof(purchases, clicks,
      leftKey = "user_id", rightKey = "c_user",
      leftTime = "ts", rightTime = "c_ts",
      rightTieBreak = Seq("click_id"), strict = true)

  test("matches the window-based as-of on the real corpus") {
    val expected = graft.pipeline.EventOps.asofClick(spark, sfDir)
      .select(col("event_id"), col("last_click_value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val got = custom
      .select(col("event_id"),
        graft.Num.roundEps(col("click_value"), 2).as("lv"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got.keySet == expected.keySet)
    val diffs = expected.keys.filter(k => got(k) != expected(k))
    assert(diffs.isEmpty, s"as-of mismatches at event_ids: ${diffs.take(5)}")
  }

  test("edge cases: no prior match, exact-time strictness, ties") {
    val l = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 50L), (4L, 30L, 10L))
      .toDF("id", "k", "t")
    val r = Seq((101L, 10L, 100L, 1.0), (102L, 10L, 150L, 2.0),
      (103L, 10L, 150L, 3.0), (104L, 20L, 60L, 4.0))
      .toDF("rid", "rk", "rt", "rv")
    def run(strict: Boolean) =
      AsofJoin.asof(l, r, "k", "rk", "t", "rt", Seq("rid"), strict)
        .select(col("id"), col("rid"), col("rv"))
        .collect().map(x => x.getLong(0) ->
          (Option(x.get(1)), Option(x.get(2)))).toMap
    val strictRes = run(strict = true)
    assert(strictRes(1L) == (None, None))          // only an equal-time click exists
    assert(strictRes(2L) == (Some(103L), Some(3.0))) // later tiebreak id wins the tie
    assert(strictRes(3L) == (None, None))          // right time after left time
    assert(strictRes(4L) == (None, None))          // key with no right rows at all
    val lenient = run(strict = false)
    assert(lenient(1L) == (Some(101L), Some(1.0))) // <= admits the equal-time row
    assert(lenient(2L) == (Some(103L), Some(3.0)))
  }

  test("physical plan is the custom exec with one exchange per side") {
    // AQE materializes exchanges lazily; audit the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = custom.queryExecution.executedPlan
      val asofs = plan.collect { case e: AsofJoinExec => e }
      assert(asofs.size == 1, s"expected AsofJoinExec in:\n$plan")
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exchanges.size == 2, s"expected 2 exchanges in:\n$plan")
      // and it still runs to the same row count without AQE
      assert(custom.count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("null keys and null times fall through to no match") {
    val l = Seq((Some(1L), Some(10L), Some(100L)), (Some(2L), None, Some(100L)),
      (Some(3L), Some(10L), None))
      .toDF("id", "k", "t")
    val r = Seq((Some(101L), Some(10L), Some(50L), Some(1.0)),
      (Some(102L), None, Some(40L), Some(9.0)),
      (Some(103L), Some(10L), None, Some(8.0)))
      .toDF("rid", "rk", "rt", "rv")
    val res = AsofJoin.asof(l, r, "k", "rk", "t", "rt")
      .select(col("id"), col("rid")).collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(res(1L) == Some(101L)) // null-key/null-time right rows skipped
    assert(res(2L) == None)
    assert(res(3L) == None)
  }
}
