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

  /** Per-(family, corpus) maintenance mutex (r15 verdict item 6): a
    * compaction stages a table out, DROPS it, and rewrites — an append
    * landing inside that window is silently lost with the overwrite,
    * and a fold's probe read inside the drop window throws. Every
    * fold (stream processBatch / batch append) and every compactor
    * takes its family's lock for the corpus dir it touches, so
    * fold-vs-compact and compact-vs-restart-compact serialize per
    * family while DIFFERENT families (and different corpora) stay
    * fully concurrent — the contention unit is one index family of
    * one corpus, never the session. Intrinsic monitors are reentrant,
    * so a locked fold calling its (locked) append helper is fine.
    * Driver-side JVM state: all lake mutations are driver-coordinated
    * (a lake table has ONE owner process — the standard no-transaction-
    * log discipline); cross-process writers are out of contract.
    * Reader-vs-compact (a concurrent QUERY scanning a table mid-
    * rewrite) remains the documented nightly-window caveat — snapshot
    * isolation is a table-format feature this engine does not owe. */
  private[graft] object IndexLocks {
    private val locks =
      new java.util.concurrent.ConcurrentHashMap[String, Object]()
    def withLock[T](family: String, dir: String)(f: => T): T =
      locks.computeIfAbsent(s"$family:$dir", _ => new Object)
        .synchronized(f)
  }

  /** Compact every persisted index table for `dir`; returns
    * family → tables rewritten (families with nothing on disk absent). */
  def compactAll(spark: SparkSession, dir: String,
      annKinds: Seq[String] = Seq("md5", "trained", "residual", "opq"))
      : Map[String, Int] = {
    // sweep every ann kind table that PHYSICALLY exists, not just the
    // caller's list — the deletion sidecar may only clear once every
    // kind materialized it (Similarity.removeFromAnnIndex's contract)
    val presentKinds = Similarity.annCodeKindsPresent(spark, dir)
    val sweepKinds = (annKinds ++ presentKinds).distinct
    val counts = Seq(
      "dedup" -> Dedup.compactDedupIfPresent(spark, dir),
      "semantic" -> Similarity.compactSemIfPresent(spark, dir),
      "ann_codes" -> sweepKinds.map(k =>
        Similarity.compactAnnIndexIfPresent(spark, dir, k) min 1).sum,
      "ann_vecs" -> Similarity.compactAnnVecsIfPresent(spark, dir).min(1),
      "lmscore" -> TrainingPrep.compactScoredIfPresent(spark, dir))
    // every existing ann table (all kinds + the refine vecs) has now
    // rewritten without the tombstoned vecs — forget the sidecar. A
    // sidecar recorded before ANY ann table was built survives (the
    // future first-touch build re-derives from the corpus, which
    // still contains the vec). Re-list AFTER the sweep: a kind table
    // first-touch-built mid-sweep was not rewritten — but since r17
    // first-touch builds apply the sidecar at build time (codeTable),
    // such a table carries no tombstoned rows and the clear cannot
    // resurrect anything; the subset check stays as defense in depth,
    // and re-list + clear run as ONE critical section under the ann
    // lock (reentrant) so no build racing the gap invalidates the
    // decision the gap was based on (r17 ADVICE TOCTOU item).
    IndexLocks.withLock("ann", dir) {
      val presentAfter = Similarity.annCodeKindsPresent(spark, dir)
      if (presentKinds.nonEmpty &&
          presentAfter.toSet.subsetOf(sweepKinds.toSet))
        Similarity.clearAnnTombstones(spark, dir)
    }
    counts.filter(_._2 > 0).toMap
  }
}
