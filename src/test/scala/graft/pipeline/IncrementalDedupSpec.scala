package graft.pipeline

import graft.SparkSpec

/** The incremental pass must equal the full minhash pass restricted to
  * delta-touching pairs — same band keys, same exact verification, so
  * the only degree of freedom is the candidate restriction, and that
  * restriction must be lossless for pairs with a delta member. */
class IncrementalDedupSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("incremental dedup equals the full pass restricted to delta-touching pairs") {
    val full = pairs(Dedup.minhashLsh(spark, sfDir))
    val expected = full.filter { case (d1, d2, _) =>
      d1 % Dedup.DeltaMod == 0 || d2 % Dedup.DeltaMod == 0 }
    val got = pairs(Dedup.incremental(spark, sfDir))
    assert(expected.nonEmpty, "corpus should contain delta-touching dup pairs")
    assert(got === expected)
    // and the restriction is real: the full pass has pairs the
    // incremental one correctly does not re-derive
    assert(full.size > expected.size,
      "fixture should contain base-base pairs outside the delta")
  }

  test("posting index is a lake table: a FRESH session reads it back") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // first run writes the bucketed index table
    val first = pairs(Dedup.incremental(spark, sfDir))
    // a fresh session has NONE of this session's cached artifacts —
    // the only shared state is the catalog + the files on disk, so
    // equality here proves the delta pass ran against the STORED index
    val s2 = spark.newSession()
    val again = Dedup.incremental(s2, sfDir)
    assert(pairs(again) === first)
    // and BOTH lake artifacts really are the persisted tables — the
    // fresh session's incremental pass reads the corpus only through
    // them (plus the delta docs), never a full-corpus shingle rebuild
    def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.relation.location.rootPaths.mkString
      }
    assert(scanPaths(Dedup.minhashIndexTable(s2, sfDir))
      .exists(_.contains("graft_minhash_idx")))
    assert(scanPaths(Dedup.shingleIndexTable(s2, sfDir))
      .exists(_.contains("graft_shingles")))
    // the query's own plan names both catalog tables in its scans
    val planStr = again.queryExecution.executedPlan.toString()
    assert(planStr.contains("graft_minhash_idx"), planStr.take(2000))
    assert(planStr.contains("graft_shingles"), planStr.take(2000))
  }

  test("shuffle-strategy delta probe needs ZERO Exchange on the index side") {
    import org.apache.spark.sql.functions.col
    val index = Dedup.minhashIndexTable(spark, sfDir)
    // a non-bucketed stand-in for an over-broadcast-bound delta batch
    val deltaRows = index.limit(50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    import spark.implicits._
    val delta = deltaRows.toDF("k", "dd")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = index.join(delta.hint("shuffle_hash"), "k")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("ShuffledHashJoin"),
        s"expected the shuffle_hash arm:\n$plan")
      // the one exchange is the DELTA being routed to the index's
      // bucket layout; the bucketed index scan itself moves nothing
      assert(plan.sliding("Exchange".length).count(_ == "Exchange") == 1,
        s"bucketed index side should not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
