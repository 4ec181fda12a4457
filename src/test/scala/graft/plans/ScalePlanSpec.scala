package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** The 100× question, asserted mechanically: the plan SHAPES the
  * engine pins at sf0.001 (PlanAuditSpec) must hold unchanged on the
  * sf10 corpus (100× the bench SF, ~60M lineitem / ~2M docs from
  * graft.ScaleUp). Catalyst picks join strategies from SIZE estimates,
  * so "works at test SF" does not imply "same plan at scale" — a
  * dimension drifting past the broadcast threshold or a stats change
  * flipping a join to sort-merge is exactly the regression this spec
  * exists to catch. Plan-shape-only (explain, no execution), so it
  * costs seconds even against the 100× corpus.
  *
  * Runs only when the scale corpus exists (generate with
  * `runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf10 100`);
  * cancelled (not silently passed) otherwise.
  */
class ScalePlanSpec extends SparkSpec {

  private val dir = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "/tmp/sf10")

  private def whenCorpus(): Unit =
    assume(new java.io.File(s"$dir/lineitem.parquet").exists(),
      s"scale corpus $dir not generated on this box")

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("sf10: dimension joins stay broadcast (q2, q5, q9)") {
    whenCorpus()
    // ScaleUp scales FACTS only (dimensions are written verbatim), so
    // the plan the engine wants at 100×: every dimension join still
    // broadcast, and at most the ONE fact–fact join (orders⋈lineitem)
    // sort-merged — that flip is correct at scale, not a regression.
    // q2 touches no fact–fact pair, so it must stay all-broadcast.
    Seq(
      ("q2", graft.relational.TpchQueries.q2(spark, dir), 0),
      ("q5", graft.relational.TpchQueries.q5(spark, dir), 1),
      ("q9", graft.relational.TpchQueries.q9(spark, dir), 1)
    ).foreach { case (name, df, factJoins) =>
      val plan = formatted(df)
      val smj = plan.split("\n")
        .count(_.matches("^\\(\\d+\\) SortMergeJoin.*"))
      assert(smj <= factJoins,
        s"$name has $smj sort-merge joins at sf10 (allowed: the " +
          s"$factJoins fact-fact), a dimension join lost its broadcast")
      assert(plan.contains("BroadcastHashJoin"),
        s"$name lost its broadcast joins at sf10")
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"$name degenerated to a nested-loop/cartesian join at sf10")
    }
  }

  test("sf10: q21 keeps the single-scan cascaded shape") {
    whenCorpus()
    val plan = formatted(graft.relational.TpchQueries.q21(spark, dir))
    val scans = plan.split("\n").count(l =>
      l.contains("Location") && l.contains("lineitem.parquet"))
    assert(scans === 1, s"q21 re-grew to $scans lineitem scans at sf10")
    assert(!plan.contains("Expand") && !plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("sf10: band clip still reaches the events scan pushed") {
    whenCorpus()
    val plan = formatted(graft.cube.SkopeQueries.zonalMean(spark, dir))
    val pushed = plan.split("\n").filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts") &&
      pushed.contains("LessThan(ts"),
      s"ts range bound lost from pushed filters at sf10: $pushed")
  }

  test("sf10: ann_lsh still streams the vector table (all joins broadcast)") {
    whenCorpus()
    val plan = formatted(graft.pipeline.Similarity.annLsh(spark, dir))
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      "ann_lsh started shuffling the vector table at sf10")
  }

  test("sf10: ann_ivfpq_refine keeps the shortlist+probe joins broadcast") {
    whenCorpus()
    // the ADC shortlist and probe set stay probe-bounded at any corpus
    // size, so the refine re-read must never flip to a shuffle of the
    // raw-vector table
    val plan = formatted(graft.pipeline.Similarity.annIvfPqRefine(spark, dir))
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      "ann_ivfpq_refine started shuffling the vector table at sf10")
  }

  test("sf10: ann_ivfpq_residual keeps the probe side broadcast, vectors stream") {
    whenCorpus()
    // the residual frame changes WHAT the ADC kernel computes (one
    // table per probed centroid), not the plan shape: routing +
    // probe-bucket joins are probe-bounded broadcasts and the vector
    // table must only ever stream through them
    val plan = formatted(graft.pipeline.Similarity.annIvfPqResidual(spark, dir))
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      "ann_ivfpq_residual started shuffling the vector table at sf10")
  }

  test("sf10: dedup_semantic verify lookups stay broadcast under the byte bound") {
    whenCorpus()
    // 500k vectors × ~560 B ≈ 280 MB — still under BroadcastVerifyBytes,
    // so the candidate stream must not shuffle array payload. The ONE
    // allowed sort-merge is the cand self-join on the cluster key
    // (narrow posting rows; measured faster than a forced shuffle_hash,
    // 40 s vs 59 s — see dedupSemantic's in-source note).
    val plan = formatted(graft.pipeline.Similarity.dedupSemantic(spark, dir))
    val smj = plan.split("\n").count(_.matches("^\\(\\d+\\) SortMergeJoin.*"))
    assert(smj <= 1, s"dedup_semantic plans $smj sort-merges at sf10 (allowed: cand)")
    val bhj = plan.split("\n").count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2, s"verify lookups lost their broadcast at sf10 (saw $bhj)")
  }

  test("sf10: dsir_hashed keeps the two-level agg + broadcast ratio-join shape") {
    whenCorpus()
    // the hashed estimator's contract at scale: ONE corpus bigram
    // explode into the doc×bucket aggregation; the ≤64-row log-ratio
    // table joins back BROADCAST — never a corpus-side sort-merge
    val plan = formatted(graft.pipeline.TrainingPrep.dsirHashed(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      s"ratio join degraded to sort-merge:\n${plan.take(2000)}")
  }

  test("sf10: no lazily-planned query grows an unpartitioned window or Expand") {
    whenCorpus()
    import org.apache.spark.sql.execution.window.WindowExec
    // the lazily-planned subset of the inventory (same exclusions as
    // PlanAuditSpec's sweep, plus the artifact-backed dedup/ANN family
    // whose CONSTRUCTION pays a scale-dependent job — their shapes are
    // pinned by SkewSpec/AnnRecallSpec end-to-end instead)
    val excluded = Set(
      "dedup_clusters", "docs_dedup_apply", "skope_cube_zonal",
      "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
      "dedup_embedding", "dedup_substring", "dedup_exact",
      "dedup_incremental", "dedup_semantic",
      "ann_ivf", "ann_lsh", "ann_topk", "ann_recall",
      "skope_geotiff_ingest", "skope_settings",
      // r19: trained-langid plans through its trainer (weights are an
      // artifact build — 12 corpus-scale rounds, not a lazy plan);
      // its sf10 feature/scoring shape is pinned plan-only in
      // LangIdClfSpec. mm_dhash's bucketPairs runs its hot-gate probe
      // (one corpus action) at plan time — its join shape is pinned
      // by DhashSpec + the shared SkewSpec hardening.
      "text_langid_clf", "mm_dhash")
    val expandAllowed = Set("events_hourly_rollup")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => excluded(q._1))
      .foreach { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.sparkPlan
        val unpartitioned = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        assert(unpartitioned.isEmpty,
          s"$name plans an unpartitioned Window at sf10")
        if (!expandAllowed(name))
          assert(!plan.toString.contains("Expand"),
            s"$name plans an Expand at sf10")
      }
  }
}
