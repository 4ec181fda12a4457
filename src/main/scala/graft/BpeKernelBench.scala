package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Bpe

/** The r13-verdict BPE bench point: per-document apply cost of the
  * rank-table kernel must be FLAT in the merge count (the replace
  * chain is O(Merges) codegen'd passes per document and cannot carry
  * a production 32k-merge vocabulary). Protocol: the trained 24-merge
  * table, padded with never-occurring ranks to 4096, applied over
  * SPARK_GRAFT_SF_DIR's documents; min-of-2 per variant; one JSON
  * line. The chain is also timed at 24 / 96 / 384 synthetic ranks to
  * show ITS linear-in-merges wall, stopping well short of the depth
  * where Catalyst's expression-tree costs dominate.
  */
object BpeKernelBench {

  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  private def minOf2(f: => Long): (Double, Long) = {
    val a = time(f); val b = time(f)
    (math.min(a._1, b._1), a._2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val trained = Bpe.trainMerges(spark, sfDir)
      def pad(to: Int): Seq[(String, String)] =
        trained ++ (0 until (to - trained.length)).map(i =>
          ("q" * (50 + i % 7), "q" * (57 + i % 11)))

      def sumTokens(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(sum(col("n_tokens_bpe"))).collect()(0).getLong(0)

      // warm the scan + JVM once
      sumTokens(Bpe.tokensBpeKernel(spark, sfDir))

      val (k24, tok24) = minOf2(sumTokens(Bpe.tokensBpeKernel(spark, sfDir)))
      val (k4096, tok4096) =
        minOf2(sumTokens(Bpe.tokensBpeKernelWith(spark, sfDir, pad(4096))))
      require(tok24 == tok4096,
        s"padded table changed the output: $tok24 vs $tok4096")
      // the PRODUCTION-shaped path (r14 verdict item 7): merge table
      // trained to the MergesTrainedCap (early-stops when the corpus
      // vocabulary dries), applied by the same kernel — corpus
      // tokenization wall at the trained table
      val trainedK = Bpe.trainMergesK(spark, sfDir, Bpe.MergesTrainedCap)
      val (kTrained, tokTrained) =
        minOf2(sumTokens(Bpe.tokensBpeTrained(spark, sfDir)))
      require(tokTrained <= tok24,
        s"more merges increased tokens: $tokTrained vs $tok24")
      val (c24, ctok) = minOf2(sumTokens(Bpe.tokensBpe(spark, sfDir)))
      require(ctok == tok24, s"kernel diverged from chain: $tok24 vs $ctok")
      // the chain's wall, demonstrated directly: linear growth while
      // the expression tree stays analyzable, then a hard
      // StackOverflowError once the nested-replace tree out-runs the
      // analyzer's recursion (reported as -1 — the chain literally
      // cannot express a production merge count)
      val chainPts = Seq(96, 384).map { m =>
        val merges = pad(m)
        val t =
          try {
            minOf2 {
              val repr = merges.foldLeft(
                regexp_replace(regexp_replace(lower(col("text")),
                  "[^a-z]+", " "), "([a-z])", "|$1|")) { case (e, (l, r)) =>
                call_function("replace", e, lit(s"|$l||$r|"), lit(s"|$l$r|"))
              }
              Tables.documents(spark, sfDir)
                .select((((length(repr) - length(call_function("replace",
                  repr, lit("|"), lit("")))) / 2).cast("long")).as("n"))
                .agg(sum(col("n"))).collect()(0).getLong(0)
            }._1
          } catch { case _: StackOverflowError => -1.0 }
        s""""chain_$m":$t"""
      }
      println(
        f"""{"metric":"bpe_apply","unit":"sec","sf":"$sfDir","kernel_24":$k24%.2f,"kernel_4096":$k4096%.2f,"kernel_trained":$kTrained%.2f,"ranks_trained":${trainedK.length},"tokens_trained":$tokTrained,"chain_24":$c24%.2f,${chainPts.mkString(",")},"total_tokens":$tok24}""")
    } finally spark.stop()
  }
}
