package graft.pipeline

import graft.SparkSpec

/** Pipeline-operator invariants that the DuckDB oracle cannot express
  * directly (equality between independent implementations).
  */
class PipelineSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH candidates recover the exhaustive jaccard result") {
    val exact = pairs(Dedup.ngramJaccard(spark, sfDir))
    val lsh = pairs(Dedup.minhashLsh(spark, sfDir))
    assert(exact.nonEmpty, "calibration: no near-dup pairs in test corpus")
    assert(lsh == exact)
  }

  test("simhash chunk join is lossless for hamming <= radius") {
    // pigeonhole: 8 chunks of 8 bits; any pair with hamming <= 7 shares
    // a chunk, so the bucketed join must equal brute force. Verified
    // against the DuckDB brute-force oracle too; here: sanity on size.
    val df = Dedup.simhash(spark, sfDir)
    val n = df.count()
    assert(n > 0)
    assert(df.filter("hamming > 7").count() == 0)
  }

  test("decode stub parses big-endian header fields") {
    val bytes = Array[Byte](0, 0, 1, 2, 0, 3, 0, 4) ++ Array.fill(8)(0.toByte)
    val m = Multimodal.decodeStub(Multimodal.Asset(7L, bytes))
    assert(m == Multimodal.AssetMeta(7L, 16, 258L, 3L, 4L))
  }

  test("ann brute-force and IVF agree on most neighbors (recall sanity)") {
    val bf = Similarity.annTopK(spark, sfDir)
      .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvf(spark, sfDir)
      .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }
}
