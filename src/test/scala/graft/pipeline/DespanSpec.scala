package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Span-level dedup APPLY (r12 verdict item 7): the excision kernel's
  * interval semantics and the end-to-end row-preservation guarantees —
  * a document with no corpus-recurring span must come through
  * byte-identical.
  */
class DespanSpec extends SparkSpec {

  private val L = Dedup.SpanLen // 40

  test("excise kernel: merged, overlapping and clipped intervals") {
    val text = ("a" * 10) + ("b" * 50) + ("c" * 30) // length 90
    // no starts → identity (both null and empty)
    assert(Dedup.exciseSpans(text, null) === text)
    assert(Dedup.exciseSpans(text, Array.empty) === text)
    // one span at 11 covers [11, 50]: all 40 b's of the first block
    assert(Dedup.exciseSpans(text, Array(11)) ===
      ("a" * 10) + ("b" * 10) + ("c" * 30))
    // overlapping starts merge: 11 and 21 cover [11, 60]
    assert(Dedup.exciseSpans(text, Array(21, 11)) === // order-insensitive
      ("a" * 10) + ("c" * 30))
    // disjoint islands keep the gap between them
    val t2 = "x" * 200
    val out = Dedup.exciseSpans(t2, Array(1, 101))
    assert(out === "x" * 120)
    // full coverage → empty string
    val t3 = "y" * L
    assert(Dedup.exciseSpans(t3, Array(1)) === "")
    // tail span clipped at the end
    assert(Dedup.exciseSpans(text, Array(51)) === ("a" * 10) + ("b" * 40))
  }

  test("the per-doc aggregation rides the STORED span index, no index-side Exchange") {
    Dedup.despan(spark, sfDir).count() // first touch builds + stores
    import org.apache.spark.sql.functions._
    val agg = Dedup.spanIndexTable(spark, sfDir)
      .groupBy(col("doc_id")).agg(collect_list(col("i")).as("starts"))
    val plan = agg.queryExecution.executedPlan.toString()
    assert(plan.contains("graft_spanidx_"), plan)
    assert(!plan.contains("Exchange"),
      s"doc_id-bucketed index scan must satisfy the aggregation:\n$plan")
  }

  test("non-duplicated documents are preserved byte-identical") {
    val rep = Dedup.substringDup(spark, sfDir)
      .filter(col("n_dup_spans") === 0).select("doc_id")
    val cleanCount = rep.count()
    assert(cleanCount > 0, "fixture corpus should have clean docs")
    val joined = Dedup.despan(spark, sfDir)
      .join(rep, "doc_id")
      .join(graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")), "doc_id")
    assert(joined.filter(col("text_despan") =!= col("text")).count() === 0L,
      "a doc with zero duplicated spans must be untouched")
    assert(joined.count() === cleanCount)
  }

  test("accounting: n_kept + n_dropped = original length, and despan only shrinks") {
    val rows = Dedup.despan(spark, sfDir)
      .join(graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), length(col("text")).cast("long").as("len")),
        "doc_id")
    assert(rows.filter(col("n_kept") + col("n_dropped") =!= col("len"))
      .count() === 0L)
    assert(rows.filter(length(col("text_despan")) =!= col("n_kept"))
      .count() === 0L)
    // the excision is consistent with the REPORT operator: a doc loses
    // characters iff substringDup says it has duplicated spans
    val rep = Dedup.substringDup(spark, sfDir)
      .select(col("doc_id"), col("n_dup_spans"))
    val both = rows.join(rep, "doc_id")
    assert(both.filter(col("n_dropped") > 0 && col("n_dup_spans") === 0)
      .count() === 0L)
    assert(both.filter(col("n_dropped") === 0 && col("n_dup_spans") > 0)
      .count() === 0L)
  }
}
