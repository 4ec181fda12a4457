package graft

/** Pins the r19-optimization scan fan-out (Tables.fanOutScan):
  *
  *  1. a below-parallelism scan is redistributed to the session
  *     default (the one-row-group local corpus case that serialized
  *     the map side of every text pipeline — OPTIMIZATION_r19.md);
  *  2. an input already at/above the session parallelism passes
  *     through IDENTICALLY (the production no-op guarantee: a large
  *     corpus always arrives already split, so no code path ever
  *     shuffles one);
  *  3. the rows are the same multiset either way — the exchange may
  *     reorder, never add/drop/alter.
  */
class FanOutScanSpec extends SparkSpec {

  test("one-row-group scan fans out to default parallelism, same rows") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val before = docs.rdd.getNumPartitions
    assume(before < spark.sparkContext.defaultParallelism,
      "local testdata stopped being a one-task scan — re-pin this spec")
    val fanned = Tables.fanOutScan(docs)
    assert(fanned.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // same multiset of rows (doc_id is unique in documents, so set
    // equality + count equality is a multiset compare)
    assert(fanned.count() === docs.count())
    assert(fanned.select("doc_id").except(docs.select("doc_id")).isEmpty)
    assert(docs.select("doc_id").except(fanned.select("doc_id")).isEmpty)
  }

  test("input at/above session parallelism passes through unchanged") {
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    val wide = (1 to 100).toDF("x").repartition(p + 3)
    // identity: the SAME frame comes back, so no exchange is planned
    assert(Tables.fanOutScan(wide) eq wide)
  }
}
