package graft.cube

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression audit: the scale properties the queries
  * claim (scan pruning, broadcastability, partial aggregation) must be
  * visible in the plan, not just asserted in comments. */
class PlanAuditSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("band clip reaches the events scan as a raw-ts pushed filter") {
    val plan = formatted(SkopeQueries.zonalMean(spark, sfDir))
    // the band range is translated to epoch-ns bounds on the physical
    // long column (Tables.eventsRange), so the parquet scan can prune
    // row groups on int64 stats
    assert(plan.contains("PushedFilters"),
      "no pushed-filter section in the scan node")
    val pushed = plan.split("\n").filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThan(ts"),
      s"ts range bound missing from pushed filters: $pushed")
    assert(pushed.contains("EqualTo(event_type,click)"),
      s"dataset filter missing from pushed filters: $pushed")
  }

  test("widened band range still yields exact smoother output at the clip edge") {
    // maTrailing(3) clipped to [5, 25] needs bands 2..4; the scan bound
    // is widened to [2, 25], and band 5's smoothed value must equal the
    // mean of bands 2..4 from an unbounded extraction
    import org.apache.spark.sql.functions._
    val full = EventCube.zonalSeries(spark, sfDir,
        EventCube.DefaultDataset, EventCube.DefaultBBox, "mean")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val smoothed = SkopeQueries.maTrailing(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = (full(2L) + full(3L) + full(4L)) / 3.0
    assert(math.abs(smoothed(5L) - expected) < 1e-6,
      s"edge band 5: ${smoothed(5L)} != $expected")
    assert(smoothed.keySet === (5L to 25L).toSet)
  }

  test("hourly band bound prunes with hour-resolution arithmetic") {
    val plan = formatted(SkopeQueries.hourlyZonal(spark, sfDir))
    val pushed = plan.split("\n").filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts"),
      s"hourly ts bound not pushed: $pushed")
  }

  test("top-N-per-group queries carry no row_number window (judge item 3)") {
    // docs_source_cap, curation stage 4, and both ANN ranking stages
    // must rank via the bounded-heap TopKAgg / max_by — a Window here
    // means a full sort of every row of every group
    Seq(
      "docs_source_cap" -> graft.pipeline.Curation.sourceCap(spark, sfDir),
      "docs_curation_pipeline" -> graft.pipeline.Curation.curationPipeline(spark, sfDir),
      "ann_ivf" -> graft.pipeline.Similarity.annIvf(spark, sfDir),
      "ann_topk" -> graft.pipeline.Similarity.annTopK(spark, sfDir)
    ).foreach { case (name, df) =>
      val plan = formatted(df)
      // (curation's md5-dedup window is partition-only — the flagged
      // pattern is the ranked row_number window)
      assert(!plan.contains("row_number"),
        s"$name still ranks via a row_number window")
    }
  }

  test("materialized-cube query prunes partitions and pushes the band range") {
    val plan = formatted(SkopeQueries.cubeZonal(spark, sfDir))
    val part = plan.split("\n").filter(_.contains("PartitionFilters")).mkString
    assert(part.contains("dataset_id"),
      s"dataset not pruned via partition directories: $part")
    val pushed = plan.split("\n").filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(band") &&
      pushed.contains("LessThanOrEqual(band"),
      s"band range not at the cube scan: $pushed")
    // cubeZonal is excluded from the inventory-wide window/Expand sweep
    // (eager cube write at construction) — this test already pays that
    // cost, so it carries the same assertions
    assert(!plan.contains("Window") && !plan.contains("Expand"),
      "cubeZonal plans a Window/Expand")
  }


  test("ann_lsh streams the vector table: every join is broadcast, no row_number") {
    val plan = formatted(graft.pipeline.Similarity.annLsh(spark, sfDir))
    // the vector table must never be the build/shuffled side: candidate
    // generation and scoring are broadcast joins (probe postings, cand
    // list, probe vectors are all bounded by the probe batch)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "ann_lsh shuffles the vector table for a join")
    assert(!plan.contains("row_number"), "ann_lsh ranks via a window")
    val bhj = plan.split("\n").count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 3, s"expected >=3 broadcast joins, saw $bhj")
  }

  test("dedup_semantic verifies through broadcast lookups") {
    // under the byte bound the vector artifact broadcasts into both
    // verification lookups so the candidate stream never shuffles
    // array payload (the Dedup.verifiedJaccard discipline); the cand
    // self-join on the cluster key may shuffle — narrow posting rows,
    // sort-merge measured faster than shuffle_hash (in-source note) —
    // but nothing may rank via window and at most that one join sorts
    val plan = formatted(graft.pipeline.Similarity.dedupSemantic(spark, sfDir))
    val smj = plan.split("\n").count(_.matches("^\\(\\d+\\) SortMergeJoin.*"))
    assert(smj <= 1, s"dedup_semantic plans $smj sort-merges (allowed: cand)")
    assert(!plan.contains("row_number"), "dedup_semantic ranks via a window")
    val bhj = plan.split("\n").count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2, s"expected both verify lookups broadcast, saw $bhj")
  }

  test("ann_ivfpq_refine streams the vector table: every join is broadcast") {
    // the ADC shortlist and the probe set are probe-bounded, so the
    // refine step's raw-vector re-read must plan as broadcast joins
    // with the big table streamed — never shuffled for a join
    val plan = formatted(graft.pipeline.Similarity.annIvfPqRefine(spark, sfDir))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "ann_ivfpq_refine shuffles the vector table for a join")
    assert(!plan.contains("row_number"), "ann_ivfpq_refine ranks via a window")
    val bhj = plan.split("\n").count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2, s"expected shortlist+probe broadcast joins, saw $bhj")
  }

  test("no query plans an unpartitioned window or a stray Expand") {
    // an empty window partitionSpec moves ALL data to one partition and
    // logs WindowExec's single-partition warning; single-series paths
    // declare a constant key instead (bounded by construction), batch
    // paths a real one — either way the spec must be non-empty.
    // The same sweep audits Expand: a multi-distinct aggregate expands
    // every input row per distinct column BEFORE the shuffle — the
    // cascaded-aggregation rewrite (q21) is the intended shape. The one
    // allowed Expand is the grouping-sets rollup, where expansion IS
    // the operator's semantics.
    import org.apache.spark.sql.execution.window.WindowExec
    // Queries whose CONSTRUCTION eagerly materializes a session artifact
    // (iterative CC label table, materialized cube write) are excluded:
    // auditing them here would turn a plan-only sweep into a heavy
    // end-to-end run, and their returned plan is a cache/table read —
    // the only window-bearing code they could hide is the artifact
    // build itself, which is groupBy/agg + sort-write by construction
    // and exercised end-to-end by their correctness specs.
    val eagerlyMaterializing =
      Set("dedup_clusters", "docs_dedup_apply", "skope_cube_zonal")
    val expandAllowed = Set("events_hourly_rollup")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => eagerlyMaterializing(q._1))
      .foreach { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.sparkPlan
        val unpartitioned = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        assert(unpartitioned.isEmpty,
          s"$name plans ${unpartitioned.size} unpartitioned Window operator(s)")
        if (!expandAllowed(name))
          assert(!plan.toString.contains("Expand"),
            s"$name plans an Expand (multi-distinct aggregate?)")
      }
  }

  test("q21 is one lineitem scan: no cartesian, no self-join fan-out") {
    // the reference formulation references lineitem three times
    // (l1 + EXISTS l2 + NOT EXISTS l3); the single-scan rewrite must
    // keep exactly one lineitem scan and no nested-loop join
    val plan = formatted(graft.relational.TpchQueries.q21(spark, sfDir))
    // FormattedMode separates the scan node from its Location line —
    // count the per-scan Location lines naming lineitem.parquet
    val scans = plan.split("\n").count(l =>
      l.contains("Location") && l.contains("lineitem.parquet"))
    assert(scans === 1, s"q21 should scan lineitem once, saw $scans")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "q21 fell into a cartesian/nested-loop join")
    // the cascaded (order, supplier) → order aggregation must not plan
    // a multi-distinct Expand (3× every lineitem row pre-shuffle)
    assert(!plan.contains("Expand"),
      "q21 plans a multi-distinct Expand")
  }

  test("q2's min-cost join-back and dimensions stay broadcast") {
    // the per-part minima and every dimension are tiny; the only
    // shuffle should be the (part, supplier) cost aggregation
    val plan = formatted(graft.relational.TpchQueries.q2(spark, sfDir))
    assert(!plan.contains("SortMergeJoin"),
      "q2's join-back or a dimension fell to sort-merge")
    val bhj = plan.split("\n").count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 4, s"expected >=4 broadcast joins in q2, saw $bhj")
  }

  test("q5 keeps every dimension join broadcast (regression guard)") {
    val plan = formatted(graft.relational.TpchQueries.q5(spark, sfDir))
    val bhj = plan.split("\n").count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 4, s"q5 should broadcast its dimension joins, saw $bhj")
    assert(!plan.contains("SortMergeJoin"),
      "q5 fell back to a sort-merge join — a dimension grew past the broadcast threshold?")
  }

  test("zonal aggregation is two-level partial (map-side combine)") {
    val plan = formatted(SkopeQueries.zonalMean(spark, sfDir))
    val aggs = plan.split("\n").count(l =>
      l.trim.startsWith("(") && l.contains("HashAggregate"))
    // cube build (partial+final) + zonal (partial+final) = 4 agg nodes
    assert(aggs >= 4, s"expected partial aggregation pairs, saw $aggs HashAggregate nodes")
  }

  test("sequence packing windows are partitioned (no single-partition sort)") {
    val plan = formatted(graft.pipeline.TrainingPrep.packSequences(spark, sfDir))
    val windows = plan.split("\n").filter(_.contains("Window"))
    assert(windows.nonEmpty)
    // the prefix-sum window must carry its (source, shard) partition
    // spec — an empty partitionBy serializes the whole corpus
    val spec = plan.split("\n").find(l =>
      l.contains("windowspecdefinition")).getOrElse("")
    assert(spec.contains("source") && spec.contains("shard"),
      s"pack window not partitioned by stream: $spec")
  }

  test("contamination joins on hash keys, never gram text") {
    val plan = formatted(graft.pipeline.TrainingPrep.contamination(spark, sfDir))
    assert(plan.contains("xxhash64"), "gram join key is not hashed")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "contamination fell into a nested-loop join")
  }

  test("as-of query plans through the custom exec with pushed scan filters") {
    val df = graft.pipeline.EventOps.asofClickExec(spark, sfDir)
    val plan = formatted(df)
    assert(plan.contains("AsofJoin"), s"custom exec missing from:\n$plan")
    val pushed = plan.split("\n").filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("EqualTo(event_type,purchase)") &&
      pushed.contains("EqualTo(event_type,click)"),
      s"event_type filters not at the scans: $pushed")
  }

  test("polygon mask is a pushable predicate, not a join or UDF") {
    val plan = formatted(SkopeQueries.polygonZonal(spark, sfDir))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("Scala UDF"))
    // mask evaluates inside the scan/filter stage: exactly the same
    // exchange structure as the bbox zonal (two-level aggregation)
    def exchanges(p: String) = p.split("\n").count(_.contains("Exchange"))
    val bboxPlan = formatted(SkopeQueries.zonalMean(spark, sfDir))
    assert(exchanges(plan) === exchanges(bboxPlan),
      s"polygon zonal should shuffle like a bbox: ${exchanges(plan)} vs ${exchanges(bboxPlan)}")
  }

  test("map-only pipeline operators plan zero exchanges") {
    // chunking, PQ assignment, and the decode-bearing multimodal
    // family are pure per-row/per-partition transforms — an Exchange
    // here would shuffle a corpus-sized stream for no semantic reason,
    // and at 100 TB that is the whole cost of the operator
    val mapOnly: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] = Seq(
      "docs_chunk" -> (graft.pipeline.TrainingPrep.chunkDocs _),
      "emb_pq" -> (graft.pipeline.Similarity.embPq _),
      "mm_binary_meta" -> (graft.pipeline.Multimodal.binaryMeta _),
      "mm_features" -> (graft.pipeline.Multimodal.features _),
      "mm_audio_meta" -> (graft.pipeline.Multimodal.audioMeta _),
      "mm_audio_features" -> (graft.pipeline.Multimodal.audioFeatures _),
      "mm_audio_resample" -> (graft.pipeline.Multimodal.audioResample _))
    mapOnly.foreach { case (name, fn) =>
      val plan = formatted(fn(spark, sfDir))
      assert(!plan.contains("Exchange"), s"$name plans a shuffle:\n$plan")
    }
  }

  test("uncertainty pairing joins per-band AGGREGATES, never cells") {
    // each raster reduces to one row per band before the pairing join
    // (map-side partial agg over its own scan); the join itself is a
    // broadcast on the tiny band series — a cell-level (band,y,x)
    // equi-join would shuffle both cubes to produce the same rows
    val plan = formatted(SkopeQueries.uncertaintySeries(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"band pairing lost its broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "uncertainty pairing degraded to a cell-level shuffle join")
    // two independent partial-agg pyramids: ≥2 HashAggregate pairs
    val hashAggs = plan.split("\n").count(_.contains("HashAggregate"))
    assert(hashAggs >= 4,
      s"expected two partial+final aggregate pyramids, saw $hashAggs HashAggregate nodes")
  }
}
