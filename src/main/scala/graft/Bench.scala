package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Short aliases for the bench JSON line. The driver machine-parses ONE
    * JSON line from a 2000-char output tail; at 86 queries the full-name
    * line was ~1975 chars — zero headroom. Aliased the line is ~1.2k
    * chars, leaving room for new inventory. The mapping is the single
    * source of truth (BenchSpec asserts it is unique and total over
    * SparkEntry.queries); family prefix: s=skope, t=text, d=dedup,
    * a=ann/embedding, e=events, c=docs/curation, m=multimodal, TPC-H
    * keeps its q-number.
    *
    * HEADROOM (round 13, the r12-verdict headroom item): shortened to
    * ≤6-char aliases — worst-case line ~1.63k chars, ≥15 new queries of
    * headroom (BenchLineSpec asserts it). Key to the dense suffixes:
    * ann family `a_ip*` = ivf+pq, then t=trained, r=residual, o=opq,
    * trailing c=recall, f=refine; skope geotiff
    * `s_gti/s_gex/s_u6/s_i6/s_lz/s_tl` =
    * ingest/export/uint16/int16/lzw/tiled; mm `m_b*`=binary, `m_a*`=
    * audio (m_ah=ahash), `m_j*`=jpeg; curation c_cn/c_pp/c_pk/c_sm/
    * c_sp/c_ch/c_dc = contamination/pipeline/pack/sample/split/chunk/
    * decontaminate.
    */
  val alias: Map[String, String] = Map(
    // TPC-H
    "q1_pricing" -> "q1", "q3_shipping" -> "q3", "q4_priority" -> "q4",
    "q5_region_rev" -> "q5", "q6_forecast" -> "q6", "q7_volume" -> "q7",
    "q8_market_share" -> "q8", "q10_returns" -> "q10",
    "q13_custdist" -> "q13", "q14_promo" -> "q14",
    "q15_top_supplier" -> "q15", "q16_parts_suppliers" -> "q16",
    "q17_small_qty" -> "q17", "q18_large_cust" -> "q18",
    "q19_brand_disc" -> "q19", "q22_idle_cust" -> "q22",
    "q2_min_cost_supp" -> "q2", "q9_product_profit" -> "q9",
    "q11_important_stock" -> "q11",
    "q12_ship_class" -> "q12", "q20_excess_supp" -> "q20",
    "q21_wait_supp" -> "q21",
    // skope core
    "skope_metadata" -> "s_me", "skope_band_index" -> "s_bn",
    "skope_yearly_band_index" -> "s_yr", "skope_batch_extract" -> "s_ba",
    "skope_select_point" -> "s_pnt", "skope_zonal_mean" -> "s_zmn",
    "skope_zonal_median" -> "s_zmd", "skope_cube_zonal" -> "s_cz",
    "skope_cube_spatial" -> "s_cs",
    "skope_ncells_area" -> "s_ncl", "skope_ma_centered" -> "s_mac",
    "skope_ma_trailing" -> "s_mat", "skope_zscore_moving" -> "s_zsm",
    "skope_zscore_fixed" -> "s_zsf", "skope_zscore_selected" -> "s_zss",
    "skope_multi_series" -> "s_msr", "skope_summary_stats" -> "s_sts",
    "skope_v1_timeseries" -> "s_v1", "skope_quantiles" -> "s_qnt",
    "skope_variable_props" -> "s_vpr", "skope_multi_area" -> "s_mar",
    "skope_hourly_zonal" -> "s_hr", "skope_zonal_profile" -> "s_prf",
    "skope_monthly_zonal" -> "s_mon", "skope_quantiles_approx" -> "s_qx",
    "skope_zonal_median_approx" -> "s_zx", "skope_anomalies" -> "s_an",
    "skope_polygon_mask" -> "s_pms", "skope_polygon_zonal" -> "s_pzn",
    "skope_polygon_hole" -> "s_phl", "skope_feature_union" -> "s_fu",
    "skope_geodesic_area" -> "s_ge", "skope_gap_fill" -> "s_gp",
    "skope_settings" -> "s_set", "skope_geotiff_ingest" -> "s_gti",
    "skope_geotiff_export" -> "s_gx", "skope_geotiff_uint16" -> "s_u6",
    "skope_geotiff_monthly" -> "s_gm", "skope_geotiff_int16" -> "s_i6",
    "skope_geotiff_lzw" -> "s_lz",
    "skope_raster_series" -> "s_rsr",
    "skope_uncertainty_series" -> "s_unc",
    // text analysis
    "text_fingerprint" -> "t_fp", "text_langid" -> "t_lg",
    "text_pii_scrub" -> "t_pi", "text_quality" -> "t_ql",
    "text_repetition" -> "t_rp", "text_tokens" -> "t_tk",
    "text_unigram_logprob" -> "t_lp", "text_vocab" -> "t_vc",
    "text_bigrams" -> "t_bg",
    // dedup family
    "dedup_clusters" -> "d_cc", "dedup_embedding" -> "d_emb",
    "dedup_exact" -> "d_ex", "dedup_minhash_lsh" -> "d_mh",
    "dedup_ngram_jaccard" -> "d_jac", "dedup_simhash" -> "d_sh",
    "dedup_substring" -> "d_sb", "docs_dedup_apply" -> "d_ap",
    // ANN / embeddings
    "ann_ivf" -> "a_iv", "ann_lsh" -> "a_ls", "ann_recall" -> "a_rc",
    "ann_topk" -> "a_tk", "emb_centroids" -> "a_ce",
    "emb_quantize" -> "a_qn", "emb_pq" -> "a_pq",
    "ann_ivfpq" -> "a_ip", "dedup_semantic" -> "d_sm",
    "ann_ivfpq_recall" -> "a_ipc", "ann_ivfpq_refine" -> "a_ipf",
    "dedup_incremental" -> "d_ic",
    "emb_pq_trained" -> "a_pt", "ann_ivfpq_trained" -> "a_ipt",
    "ann_ivfpq_trained_recall" -> "a_itc",
    "ann_ivfpq_residual" -> "a_ipr",
    "ann_ivfpq_residual_recall" -> "a_irc",
    // events
    "events_asof_click" -> "e_as", "events_attr_window" -> "e_at",
    "events_funnel" -> "e_fn", "events_hourly_rollup" -> "e_rl",
    "events_retention" -> "e_rt", "events_sessionize" -> "e_ss",
    "events_topk_users" -> "e_tk",
    // docs curation / training prep
    "docs_contamination" -> "c_cn", "docs_curation_pipeline" -> "c_pp",
    "docs_mix_weights" -> "c_mx", "docs_pack_sequences" -> "c_pk",
    "docs_sample_hash" -> "c_sm", "docs_source_cap" -> "c_cp",
    "docs_split" -> "c_sp", "docs_chunk" -> "c_ch",
    "docs_decontaminate" -> "c_dc",
    // multimodal
    "mm_binary_meta" -> "m_bm", "mm_features" -> "m_bf",
    "mm_frame_sample" -> "m_fr", "mm_resize" -> "m_rs",
    "mm_audio_meta" -> "m_am", "mm_audio_features" -> "m_af",
    "mm_audio_resample" -> "m_ar",
    "mm_jpeg_meta" -> "m_jm", "mm_jpeg_features" -> "m_jf",
    "mm_ahash" -> "m_ah", "skope_geotiff_tiled" -> "s_tl",
    // BPE tokenizer family (round 13)
    "text_tokens_bpe" -> "t_bp", "docs_split_bpe" -> "c_spb",
    "docs_pack_bpe" -> "c_pkb", "docs_mix_bpe" -> "c_mxb",
    "text_vocab_bpe" -> "t_bv",
    // PCA family (round 13)
    "emb_pca" -> "a_pca", "emb_pca_project" -> "a_pcp",
    // span-level dedup apply (round 13)
    "docs_despan" -> "d_dsp",
    // BigTIFF ingest (round 13)
    "skope_geotiff_big" -> "s_bt",
    // round 14 additions (rank-table BPE, PCA top-k + whitening,
    // GeoTIFF Predictor 3)
    "text_tokens_bpek" -> "t_bk", "emb_pca_k" -> "a_pck",
    "emb_whiten" -> "a_wh", "skope_geotiff_f32pred" -> "s_fp",
    // OPQ family (round 15): o=opq, trailing c=recall
    "emb_pq_opq" -> "a_pqo", "ann_ivfpq_opq" -> "a_ipo",
    "ann_ivfpq_opq_recall" -> "a_ioc",
    // epoch-capped mixture + bigram LM score (round 15)
    "docs_mix_epochs" -> "c_mep", "text_bigram_logprob" -> "t_bl",
    "docs_lm_buckets" -> "c_lb"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-footer paths once so per-query times
    // reflect steady state, not session startup
    try SparkEntry.queries.get("q1_pricing").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    // SPARK_GRAFT_SKIP (comma-separated names or aliases): exclude
    // queries from a scale run — used for the sf10 (100×) point where
    // the documented quadratic-by-design exhaustive cosine baseline
    // (dedup_embedding) would pay 10,000× its sf0.1 pair count by
    // definition of the operator (BASELINE.md scale-evidence protocol).
    // Unset for driver rounds: the full inventory runs.
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(',').map(_.trim).toSet).getOrElse(Set.empty[String])
    // The exhaustive O(n²) cosine baseline is OPT-IN at every SF
    // (round-8 verdict item 6): it exists as the correctness anchor
    // for the sub-quadratic paths (ann_lsh / ann_ivf / minhash), and a
    // driver protocol change must not be able to run a quadratic
    // operator at scale by accident. EmbeddingPairsSpec still pins it
    // to brute force at sf0.01; set SPARK_GRAFT_EXHAUSTIVE=1 to bench
    // it deliberately.
    val exhaustiveOptIn = sys.env.contains("SPARK_GRAFT_EXHAUSTIVE")
    val named = SparkEntry.queries.toSeq
      .filter { case (n, _) =>
        !skip.contains(n) && !skip.contains(alias.getOrElse(n, n)) &&
          (exhaustiveOptIn || n != "dedup_embedding") }
      .sortBy(_._1)
    // A failed pass records +Infinity (never its elapsed time), so
    // min-of-two can only select a SUCCESSFUL pass's timing — a query
    // that runs slowly once and fails fast once must not report the
    // fast failure. A query with no successful pass surfaces as the
    // -1 marker in the JSON line (Infinity is not valid JSON) plus a
    // stderr line naming it.
    def timeOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case t: Throwable =>
        System.err.println(s"bench FAILED $name: ${t.getClass.getSimpleName}")
        Double.PositiveInfinity }
    }
    // Two FULL passes, min per query: the bench box shows rotating ~10 s
    // stall windows (BASELINE.md) that can print 29 s for a 1.4 s query.
    // Interleaving whole passes puts the two runs of each query minutes
    // apart, so one stall window cannot poison both; min-of-2 is the
    // steady-state estimate. (Second runs also skip one-shot plan/codegen
    // cost, which BASELINE.md identifies as the dominant term at sf0.1 —
    // the min is the engine's speed, which is what the 2× gate grades.)
    val pass1 = named.map { case (n, f) => n -> timeOnce(n, f) }
    // drop session-scoped derived artifacts (shingle tables, signatures,
    // cluster labels) so pass 2 re-pays the family's build cost like
    // every earlier round's bench did — otherwise min-of-2 would report
    // a cache read (~0 s) for the artifact-backed dedup/ANN queries and
    // hide the engine work the 2x gate is grading. JVM/codegen warmth
    // (the noise being targeted) still carries over.
    graft.pipeline.ArtifactCache.clear()
    val pass2 = named.map { case (n, f) => n -> timeOnce(n, f) }
    val results = pass1.zip(pass2).map { case ((n, a), (_, b)) =>
      val m = math.min(a, b)
      n -> (if (m.isInfinite) -1.0 else m) // -1 = failed in BOTH passes
    }
    // SINGLE-pass failures must be visible too (r12 verdict item 1:
    // skope_geotiff_lzw threw in one pass and min-of-2 absorbed it —
    // the stderr line scrolled out of the driver's 2000-char tail).
    // "pf" counts query-passes that threw but still produced a timing
    // via the other pass; a clean round omits the field entirely.
    val passFailures = pass1.zip(pass2).count { case ((_, a), (_, b)) =>
      a.isInfinite ^ b.isInfinite
    }
    // The driver machine-parses this line from a 2000-char output tail,
    // so the whole line must stay under ~1900 chars even as the inventory
    // grows: short aliases (map above), centisecond precision, trailing
    // zeros stripped, sf as a basename. (Round 1 failed parse on the
    // "[info] " logger prefix — hence run/outputStrategy in build.sbt;
    // round 2 on sheer length.)
    // Locale.ROOT pins the decimal separator: the default-locale format
    // emits "1,2" under a comma-decimal locale, corrupting the JSON
    def fmt(v: Double, dp: Int): String = {
      val raw = String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
      // strip trailing zeros ONLY after a decimal point — integer
      // output ("10", "100") has significant zeros
      val s = if (raw.contains('.'))
        raw.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      else raw
      if (s.isEmpty) "0" else s
    }
    val qs = results.map { case (k, v) =>
      s"\"" + alias.getOrElse(k, k) + "\":" + fmt(v, if (v >= 10) 0 else 1)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFailed = results.count(_._2 < 0)
    val sfName = new java.io.File(sfDir).getName
    // a both-passes-failed query is EXCLUDED from the headline total
    // (its time is unknown, not zero) — the "failed" field makes that
    // unmissable, so a broken build can never read as a speedup
    val failedField = if (nFailed > 0) s""","failed":$nFailed""" else ""
    val pfField = if (passFailures > 0) s""","pf":$passFailures""" else ""
    println(s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","queries":$qs,"sf":"$sfName"$failedField$pfField}""")
    System.out.flush()
    spark.stop()
  }
}
