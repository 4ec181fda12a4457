package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** The persisted ANN index family (r11 verdict item 1): trained
  * codebooks/centroids as fingerprint-named sidecar tables, PQ code
  * tables partitioned by routing centroid. Proofs here:
  *  - the stored arm is RESULT-identical to a fresh in-session encode
  *    for all three code-table kinds (md5 / trained / residual);
  *  - the ADC query scan actually partition-prunes to the probed
  *    inverted lists (the nprobe/K scan story, on the physical plan);
  *  - the code-table layout is one file per inverted list;
  *  - a fresh session (shared catalog, every in-memory artifact
  *    dropped) serves identical results straight off the stored
  *    artifacts — with the codebook sidecars present in the catalog,
  *    i.e. the KmIters training passes are write-time, not per-session.
  * The brand-new-JVM leg (catalog itself persisted) is
  * CrossJvmAnnSpec's job.
  */
class AnnIndexSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  private def rows(df: DataFrame): Set[(Long, Int, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  test("stored code tables are result-identical to a fresh encode (3 kinds)") {
    Seq("md5", "trained", "residual").foreach { kind =>
      val stored = rows(Similarity.ivfPqRanked(spark, sfDir, kind))
      val built = rows(Similarity.ivfPqRanked(spark, sfDir, kind, useStored = false))
      assert(stored.nonEmpty, s"$kind produced no rows")
      assert(stored === built, s"$kind stored arm diverged from fresh encode")
    }
  }

  test("the ADC scan partition-prunes to the probed inverted lists") {
    val plan = formatted(Similarity.annIvfPqTrained(spark, sfDir))
    assert(plan.contains("graft_anncodes_trained_"),
      "trained ADC search does not read the stored code table")
    val scanPart = plan.split("\n")
      .filter(l => l.contains("PartitionFilters") && l.contains("cent_id"))
    assert(scanPart.nonEmpty,
      s"no cent_id partition filter on the code-table scan:\n$plan")
    assert(scanPart.exists(_.contains("IN")),
      s"probed-list pruning is not an IN filter: ${scanPart.mkString}")
  }

  test("code table lays out one file per inverted list") {
    Similarity.codeTable(spark, sfDir, "trained") // ensure written
    // other suites build code tables for OTHER corpora (ScalePlanSpec
    // at sf10) in the same shared catalog — filter to this dir's
    val tbl = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_anncodes_trained_"))
      .filter(_.contains(sfDir.replaceAll("[^A-Za-z0-9]", "_")))
    assert(tbl.length === 1)
    val root = new java.io.File(graft.sources.TableIO.indexPath(tbl.head))
    val parts = root.listFiles().filter(_.getName.startsWith("cent_id="))
    assert(parts.nonEmpty, s"no cent_id= partition dirs under $root")
    parts.foreach { p =>
      val files = p.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1,
        s"${p.getName} holds ${files.length} files (want 1 per list)")
    }
  }

  test("a fresh session serves from the stored artifacts, training skipped") {
    // run once in this session so every artifact is written
    val expected = rows(Similarity.annIvfPqTrained(spark, sfDir))
    val expectedRes = rows(Similarity.annIvfPqResidual(spark, sfDir))
    // the sidecar books exist in the catalog — training is write-time
    val names = spark.catalog.listTables().collect().map(_.name)
    Seq("graft_anncb_pqt_", "graft_anncb_pqres_", "graft_anncb_ivfcc_")
      .foreach(p => assert(names.exists(_.startsWith(p)), s"missing $p table"))
    // new session, all driver/session caches dropped: day-2 cost is
    // fingerprint scan + sidecar read + pruned ADC scan
    ArtifactCache.clear()
    val s2 = spark.newSession()
    assert(rows(Similarity.annIvfPqTrained(s2, sfDir)) === expected)
    assert(rows(Similarity.annIvfPqResidual(s2, sfDir)) === expectedRes)
  }
}
