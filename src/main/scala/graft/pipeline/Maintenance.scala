package graft.pipeline

import org.apache.spark.sql.SparkSession

/** The nightly lake-maintenance job, as one entry point: every index
  * family in this engine persists fingerprint-named tables whose
  * append paths (Dedup.appendToIndex / appendSimhashToIndex /
  * Similarity.appendSemToIndex / appendAnnToIndex, and the streams'
  * restart folds) each add ≤1 file per bucket or inverted list — and
  * at 100 TB the scan bottleneck is FILE COUNT (TableIO.compact's
  * thesis). `compactAll` sweeps a corpus dir's tables and rewrites
  * whichever exist back to one file per bucket/list, preserving every
  * bucket spec and partition layout (each family's own compactor does
  * the rewrite; result identity is pinned per family in
  * IndexAppendSpec / AnnAppendSpec / AnnStreamSpec).
  *
  * Existence-guarded throughout: a deployment that only ever ran
  * minhash dedup compacts one family and skips the rest — no table is
  * created as a side effect of maintaining it. */
object Maintenance {

  /** Compact every persisted index table for `dir`; returns
    * family → tables rewritten (families with nothing on disk absent). */
  def compactAll(spark: SparkSession, dir: String,
      annKinds: Seq[String] = Seq("md5", "trained", "residual", "opq"))
      : Map[String, Int] = {
    val counts = Seq(
      "dedup" -> Dedup.compactDedupIfPresent(spark, dir),
      "semantic" -> Similarity.compactSemIfPresent(spark, dir),
      "ann_codes" -> annKinds.map(k =>
        Similarity.compactAnnIndexIfPresent(spark, dir, k) min 1).sum,
      "ann_vecs" -> Similarity.compactAnnVecsIfPresent(spark, dir).min(1))
    counts.filter(_._2 > 0).toMap
  }
}
