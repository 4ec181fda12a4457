package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {

  test("top_k keeps the k best entries ordered (score desc, id asc)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 1.0, 10L), ("a", 3.0, 11L), ("a", 2.0, 12L), ("a", 3.0, 9L),
      ("b", 5.0, 20L)).toDF("g", "score", "id")
    val out = df.groupBy($"g").agg(TopK.top_k($"score", $"id", 3).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getDouble(0), e.getLong(1)))).toMap
    // ties broken by id asc: (3.0, 9) before (3.0, 11)
    assert(out("a") == Seq((3.0, 9L), (3.0, 11L), (2.0, 12L)))
    assert(out("b") == Seq((5.0, 20L)))
  }

  test("top_k agrees with the window row_number formulation") {
    val s = spark
    import s.implicits._
    val n = 500
    val df = (1 to n).map(i => ((i % 7).toLong, (i * 37 % 101).toDouble, i.toLong))
      .toDF("g", "score", "id")
    val viaAgg = df.groupBy($"g")
      .agg(TopK.top_k($"score", $"id", 5).as("t"))
      .select($"g", explode($"t").as("e"))
      .select($"g", $"e.score", $"e.id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWin = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"g", $"score", $"id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(viaAgg == viaWin)
  }
}
