package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained language-id (r18 verdict item 4): the fastText-style
  * sparse softmax over hashed char-trigram buckets, supervised by the
  * stopword heuristic's confident subset. The floor pins that the
  * fixed-round trainer genuinely LEARNS the signal (a majority-class
  * model scores ~0.92 here and fails the unknown-recall bar), and the
  * persisted-weights path serves the identical model. */
class LangIdClfSpec extends SparkSpec {

  test("trained prediction clears the agreement floor vs the heuristic") {
    val clf = LangIdClf.langidClf(spark, sfDir)
      .select(col("doc_id"), col("clf_lang"))
    // the heuristic's confident subset, labeled exactly as training
    val h = TextAnalysis.langid(spark, sfDir)
      .select(col("doc_id"), col("pred_lang"))
    val scores = graft.Tables.documents(spark, sfDir)
      .withColumn("s_en", expr(s"size(filter(split(text, ' '), x -> x IN ${TextAnalysis.inList(TextAnalysis.StopEn)}))"))
      .withColumn("s_de", expr(s"size(filter(split(text, ' '), x -> x IN ${TextAnalysis.inList(TextAnalysis.StopDe)}))"))
      .withColumn("s_es", expr(s"size(filter(split(text, ' '), x -> x IN ${TextAnalysis.inList(TextAnalysis.StopEs)}))"))
      .withColumn("s_fr", expr(s"size(filter(split(text, ' '), x -> x IN ${TextAnalysis.inList(TextAnalysis.StopFr)}))"))
      .withColumn("s1", greatest(col("s_en"), col("s_de"), col("s_es"), col("s_fr")))
      .filter((col("s1") >= 2 &&
        ((col("s_en") === col("s1")).cast("int") +
          (col("s_de") === col("s1")).cast("int") +
          (col("s_es") === col("s1")).cast("int") +
          (col("s_fr") === col("s1")).cast("int")) === 1) ||
        col("s1") === 0)
      .select(col("doc_id"), col("s1"))
    val joined = scores.join(h, "doc_id").join(clf, "doc_id")
      .select(col("doc_id"), col("pred_lang"), col("clf_lang"), col("s1"))
      .collect()
    assert(joined.nonEmpty)
    val agree = joined.count(r => r.getString(1) == r.getString(2))
      .toDouble / joined.length
    assert(agree >= 0.95,
      f"confident-subset agreement $agree%.3f below the 0.95 floor")
    // the part a majority-class model cannot fake: confidently-unknown
    // docs (zero stopword hits in every language) must be RECOVERED
    // from char-gram buckets alone
    val unk = joined.filter(_.getInt(3) == 0)
    assert(unk.nonEmpty)
    val unkRecall = unk.count(_.getString(2) == "unknown")
      .toDouble / unk.length
    assert(unkRecall >= 0.9,
      f"unknown recall $unkRecall%.3f below the 0.9 floor")
  }

  test("sf10 plan: feature build is map-only, weight join broadcasts") {
    assume(new java.io.File("/tmp/sf10/documents.parquet").exists(),
      "scale corpus /tmp/sf10 not generated on this box")
    import spark.implicits._
    val wDf = (0 until LangIdClf.NumClasses).map(c => (c, -1L, 0.0))
      .toDF("c", "b", "w")
    // plan-only (no execution): the sf10 scoring shape must keep the
    // 20k-row weight table as the ONLY broadcast (never the corpus
    // side), the gram explode map-only, and no sort-merge anywhere —
    // Catalyst re-picks strategies from size stats at 100×, which is
    // exactly what this pins (the docs_dsir_hashed discipline)
    val plan = LangIdClf.auditScoringPlan(spark, "/tmp/sf10", wDf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("weights persist and the reloaded model serves identically") {
    val before = LangIdClf.langidClf(spark, sfDir).collect()
      .map(_.toString).toSet
    // drop every in-session memo; the next call must read the stored
    // weight table (the bench pass-2 / fresh-session path)
    ArtifactCache.clear()
    val after = LangIdClf.langidClf(spark, sfDir).collect()
      .map(_.toString).toSet
    assert(before === after)
    assert(spark.catalog.listTables().collect().map(_.name)
      .exists(_.startsWith("graft_liclf_")))
  }
}
