package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The append/compaction half of the stored dedup index (r11 verdict
  * item 2): `Dedup.appendToIndex` folds a new batch into the PERSISTED
  * bucketed posting + shingle tables, so a later delta finds the
  * earlier batch's pairs through the STORED index alone — no
  * `extraIndex` union chain. Proofs:
  *  - a day-2 delta probed with extraIndex = None finds day-1 pairs
  *    only AFTER day-1 was appended, and the result equals the old
  *    layered-extraIndex path exactly (the gold standard);
  *  - appends are idempotent at doc granularity (replay = no-op);
  *  - `Dedup.compactIndex` folds the appended files back to one per
  *    bucket without changing results, and the rewritten table still
  *    satisfies the probe join with zero index-side Exchange.
  *
  * Runs against an ISOLATED copy of the corpus (own fingerprint, own
  * tables) — appending foreign docs into the shared sfDir index would
  * poison every other suite's incremental/minhash expectations.
  */
class IndexAppendSpec extends SparkSpec {

  // day-N batches are copies of a corpus doc slice under fresh ids:
  // jac(copy, original) = jac(copy, copy') = 1.0, so cross-batch pairs
  // are guaranteed and exactly enumerable
  private val Day1Off = 1000000L
  private val Day2Off = 2000000L

  private lazy val cDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_append_corpus")
      .toString
    graft.Tables.documents(spark, sfDir).filter(col("doc_id") % 3 === 0)
      .write.parquet(d + "/documents.parquet")
    d
  }

  private def dayBatch(off: Long): DataFrame =
    graft.Tables.documents(spark, cDir)
      .filter(col("doc_id") % 9 === 0)
      .withColumn("doc_id", col("doc_id") + off)

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def indexFiles(prefix: String): Array[java.io.File] = {
    val tbl = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix))
      .filter(_.contains(cDir.replaceAll("[^A-Za-z0-9]", "_")))
    assert(tbl.length === 1, s"expected one $prefix table for $cDir")
    new java.io.File(graft.sources.TableIO.indexPath(tbl.head))
      .listFiles().filter(_.getName.endsWith(".parquet"))
  }

  test("day-2 delta finds day-1 pairs through the STORED index after append") {
    val day1 = dayBatch(Day1Off)
    val day2 = dayBatch(Day2Off)
    val day1Ids = day1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(day1Ids.nonEmpty)

    // before any append: day-1 is invisible to a plain stored-index probe
    val before = pairs(Dedup.deltaPairs(spark, cDir, day2))
    assert(!before.exists(p => day1Ids(p._1) || day1Ids(p._2)),
      "day-1 pairs must not appear before day-1 is appended")

    // gold standard: the old layered-extraIndex path over the same state
    val day1Sh = Dedup.shinglesOfDocs(day1)
    val gold = pairs(Dedup.deltaPairs(spark, cDir, day2,
      extraIndex = Some((Dedup.postingsOf(day1Sh), day1Sh))))
    assert(gold.exists(p => day1Ids(p._1) || day1Ids(p._2)),
      "fixture must contain day-1-touching pairs")

    val appended = Dedup.appendToIndex(spark, cDir, day1)
    assert(appended === day1Ids.size.toLong)

    val after = pairs(Dedup.deltaPairs(spark, cDir, day2))
    assert(after === gold)
    // the copies pair up exactly: (i + day1, i + day2) at jac 1.0
    day1Ids.foreach { d1 =>
      assert(after.contains((d1, d1 - Day1Off + Day2Off, 1.0)),
        s"missing cross-day copy pair for $d1")
    }
  }

  test("appendToIndex is idempotent: a replayed batch is a no-op") {
    val day1 = dayBatch(Day1Off)
    Dedup.appendToIndex(spark, cDir, day1) // ensure present (any order)
    val postCount = Dedup.minhashIndexTable(spark, cDir).count()
    val shCount = Dedup.shingleIndexTable(spark, cDir).count()
    assert(Dedup.appendToIndex(spark, cDir, day1) === 0L)
    assert(Dedup.minhashIndexTable(spark, cDir).count() === postCount)
    assert(Dedup.shingleIndexTable(spark, cDir).count() === shCount)
  }

  test("a torn two-table append heals on replay without duplicating postings") {
    val day1 = dayBatch(Day1Off)
    val day2 = dayBatch(Day2Off)
    Dedup.appendToIndex(spark, cDir, day1)
    Dedup.appendToIndex(spark, cDir, day2)
    val expected = pairs(Dedup.deltaPairs(spark, cDir, day2))
    val postCount = Dedup.minhashIndexTable(spark, cDir).count()

    // simulate the crash window: postings landed, shingles lost — the
    // worst case, since the rebuilt shingle table only knows the corpus
    val tbl = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_shingles_"))
      .filter(_.contains(cDir.replaceAll("[^A-Za-z0-9]", "_"))).head
    val loc = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location
    spark.sql(s"DROP TABLE $tbl")
    val p = new org.apache.hadoop.fs.Path(loc)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

    // replays backfill ONLY the missing side: shingles return, the
    // posting table is not touched (no duplicates)
    val day1Ids = day1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(Dedup.appendToIndex(spark, cDir, day1) === day1Ids.size.toLong)
    Dedup.appendToIndex(spark, cDir, day2)
    assert(Dedup.minhashIndexTable(spark, cDir).count() === postCount)
    assert(pairs(Dedup.deltaPairs(spark, cDir, day2)) === expected)
  }

  test("a compaction crash in the drop window recovers from staging") {
    val day1 = dayBatch(Day1Off)
    Dedup.appendToIndex(spark, cDir, day1)
    val expected = pairs(Dedup.deltaPairs(spark, cDir, dayBatch(Day2Off)))
    val tbl = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_shingles_"))
      .filter(_.contains(cDir.replaceAll("[^A-Za-z0-9]", "_"))).head
    val loc = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location.toString
    val rows = spark.table(tbl).count()

    // simulate compactBucketed dying between its stage-out and the
    // rewrite's commit: staging complete, table (catalog + files) gone
    spark.table(tbl).write.parquet(loc.stripSuffix("/") + "_compact_staging")
    spark.sql(s"DROP TABLE $tbl")
    val p = new org.apache.hadoop.fs.Path(loc)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

    // first touch must restore corpus + day-1 folds from the staging,
    // NOT rebuild corpus-only (which would silently lose the fold)
    assert(Dedup.shingleIndexTable(spark, cDir).count() === rows)
    assert(pairs(Dedup.deltaPairs(spark, cDir, dayBatch(Day2Off)))
      === expected)
  }

  test("compactIndex folds appended files to one per bucket, results intact") {
    val day1 = dayBatch(Day1Off)
    val day2 = dayBatch(Day2Off)
    Dedup.appendToIndex(spark, cDir, day1)
    Dedup.appendToIndex(spark, cDir, day2)
    val expected = pairs(Dedup.deltaPairs(spark, cDir, day2))
    assert(indexFiles("graft_minhash_idx_").length > Dedup.IndexBuckets,
      "appends should have accumulated extra per-bucket files")

    Dedup.compactIndex(spark, cDir)
    assert(indexFiles("graft_minhash_idx_").length === Dedup.IndexBuckets)
    // shingle rows are doc-linear (few hundred at this SF) — a bucket
    // can legitimately be empty, so pin "no more than one file per
    // bucket" rather than an exact count
    assert(indexFiles("graft_shingles_").length <= Dedup.IndexBuckets)
    assert(pairs(Dedup.deltaPairs(spark, cDir, day2)) === expected)

    // the rewritten table still carries the bucket spec the probe
    // relies on: shuffle_hash probe, ONE exchange (the delta side)
    val s = spark
    import s.implicits._
    val index = Dedup.minhashIndexTable(spark, cDir)
    val delta = index.limit(20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.toDF("k", "dd")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = index.join(delta.hint("shuffle_hash"), "k")
        .queryExecution.executedPlan.toString()
      assert(plan.contains("ShuffledHashJoin"), plan)
      assert(plan.sliding("Exchange".length).count(_ == "Exchange") == 1,
        s"compacted index side should not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("permanent removal survives fold → compact → re-ingest → fold") {
    // unlike a plain sidecar delete (sticky only until compaction
    // clears it), permanent = true records the ids in the
    // never-reingest registry, which every append path subtracts —
    // so the compact-then-replay sequence cannot resurrect them
    val batch = dayBatch(3000000L)
    assert(Dedup.appendToIndex(spark, cDir, batch) > 0L)
    val ids = batch.select("doc_id").collect().map(_.getLong(0))
      .sorted.take(3).toSeq
    assert(Dedup.removeFromIndex(spark, cDir, ids, permanent = true)
      === ids.size.toLong)
    assert(Dedup.minhashIndexTable(spark, cDir)
      .filter(col("doc_id").isin(ids: _*)).count() === 0L)
    // compaction materializes the deletion and CLEARS the family
    // sidecar — the window where a non-permanent delete becomes
    // re-ingestable
    Dedup.compactIndex(spark, cDir)
    assert(Dedup.minhashIndexTable(spark, cDir, raw = true)
      .filter(col("doc_id").isin(ids: _*)).count() === 0L)
    // replayed ingest containing the removed docs: appends nothing
    assert(Dedup.appendToIndex(spark, cDir,
      batch.filter(col("doc_id").isin(ids: _*))) === 0L)
    assert(Dedup.minhashIndexTable(spark, cDir, raw = true)
      .filter(col("doc_id").isin(ids: _*)).count() === 0L)
    // a second compact + full-batch fold cycle stays clean too
    Dedup.compactIndex(spark, cDir)
    assert(Dedup.appendToIndex(spark, cDir, batch) === 0L)
    assert(Dedup.minhashIndexTable(spark, cDir)
      .filter(col("doc_id").isin(ids: _*)).count() === 0L)
    assert(Dedup.shingleIndexTable(spark, cDir, raw = true)
      .filter(col("doc_id").isin(ids: _*)).count() === 0L)
  }
}
