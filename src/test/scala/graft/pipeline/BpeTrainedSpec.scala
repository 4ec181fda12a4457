package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The production-shaped tokenizer path (r14 verdict item 7): a
  * trained merge table capped at MergesTrainedCap feeding the
  * rank-table kernel. The capped trainer has no SQL oracle by design
  * (a 512-round CTE chain is DuckDB-intractable); exactness is pinned
  * here against an INDEPENDENTLY-WRITTEN reference trainer — a naive
  * re-derivation of the BPE definition using different data
  * structures (immutable lists + sliding windows vs the engine's
  * mutable arrays + index loops). text_tokens_bpek's 24-merge oracle
  * stays the cross-engine exactness anchor.
  */
class BpeTrainedSpec extends SparkSpec {

  /** Reference trainer: straight from the BPE definition. Vocab =
    * top-VocabCap (count desc, word asc) `[a-z]+` runs; per round,
    * count adjacent pairs weighted by word frequency, merge the
    * (count desc, left asc, right asc) winner left-to-right
    * non-overlapping; stop at the cap or when no pairs remain. */
  private def referenceTrain(wordCounts: Seq[(String, Long)],
      cap: Int): List[(String, String)] = {
    def mergeOnce(toks: List[String], l: String, r: String): List[String] =
      toks match {
        case a :: b :: rest if a == l && b == r =>
          (l + r) :: mergeOnce(rest, l, r)
        case a :: rest => a :: mergeOnce(rest, l, r)
        case Nil => Nil
      }
    var reprs = wordCounts.map { case (w, c) => (w.map(_.toString).toList, c) }
    var merges = List.empty[(String, String)]
    var round = 0
    var done = false
    while (round < cap && !done) {
      val pairCounts = reprs.flatMap { case (toks, c) =>
        toks.sliding(2).collect { case List(a, b) => ((a, b), c) }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairCounts.isEmpty) done = true
      else {
        val (l, r) = pairCounts.toSeq
          .sortBy { case ((pl, pr), c) => (-c, pl, pr) }.head._1
        merges = merges :+ ((l, r))
        reprs = reprs.map { case (toks, c) => (mergeOnce(toks, l, r), c) }
        round += 1
      }
    }
    merges
  }

  private def corpusVocab(): Seq[(String, Long)] =
    graft.Tables.documents(spark, sfDir)
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(Bpe.VocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("capped trainer matches the independent reference implementation") {
    val trained = Bpe.trainMergesK(spark, sfDir, Bpe.MergesTrainedCap)
    val ref = referenceTrain(corpusVocab(), Bpe.MergesTrainedCap)
    assert(trained === ref)
    // this corpus's vocabulary dries before the cap — the early-stop
    // path is genuinely exercised, and every word is fully merged
    assert(trained.length < Bpe.MergesTrainedCap,
      s"expected early stop, got ${trained.length} merges")
    assert(trained.nonEmpty)
  }

  test("the oracle table is a prefix of the capped table") {
    val capped = Bpe.trainMergesK(spark, sfDir, Bpe.MergesTrainedCap)
    val oracle = Bpe.trainMerges(spark, sfDir)
    assert(capped.take(Bpe.Merges) === oracle,
      "same discipline must be prefix-stable")
  }

  test("kernel apply under the trained table matches the sequential chain") {
    val merges = Bpe.trainMergesK(spark, sfDir, Bpe.MergesTrainedCap)
    val ranks = Bpe.rankTable(merges)
    corpusVocab().map(_._1).foreach { w =>
      assert(Bpe.applyRanked(w, ranks).toSeq === Bpe.tokensOf(w, merges).toSeq,
        s"kernel diverged from chain on '$w'")
    }
  }

  test("trained accounting: more merges never increase the token count") {
    val at24 = Bpe.tokensBpe(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Bpe.tokensBpeTrained(spark, sfDir).collect()
    assert(rows.length === at24.size)
    rows.foreach { r =>
      assert(r.getLong(1) <= at24(r.getLong(0)),
        s"doc ${r.getLong(0)}: trained table increased token count")
    }
    // and it genuinely merged further on this corpus
    assert(rows.map(_.getLong(1)).sum < at24.values.sum)
  }
}
