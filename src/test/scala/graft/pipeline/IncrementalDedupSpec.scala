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
}
