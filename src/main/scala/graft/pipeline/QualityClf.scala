package graft.pipeline

import graft.{Num, Tables}
import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier — the stage of the public
  * curation stack (CCNet §4.4, GPT-3 appendix A, RedPajama) that pairs
  * the LM perplexity strata with a TRAINED linear model over cheap
  * document features: a logistic regression scored over every document
  * and thresholded to keep "reference-quality-looking" text.
  *
  * Everything is deterministic in the k-means/PCA/mixEpochs
  * discipline — no RNG anywhere:
  *  - LABELS are derived from the engine's own signals: y = 1 iff the
  *    document lands in the `head` tercile of [[TrainingPrep.lmBuckets]]
  *    (lowest perplexity under the corpus's own bigram LM) — the CCNet
  *    trick of letting one quality signal supervise a cheaper one,
  *    with no hand-labeled set.
  *  - FEATURES are exact integer ratios (stopword fraction, 1 − punct
  *    fraction, capped length, and [[HashBuckets]] hashed-token bucket
  *    fractions keyed by the engine-portable md5 hash) — every feature
  *    is the same IEEE double in Spark and DuckDB, no aggregation-order
  *    noise enters below the gradient sums.
  *  - TRAINING is [[TrainRounds]] fixed full-batch gradient-descent
  *    rounds (lr 1.0, zero init); each round's gradient vector and the
  *    updated weights are 6-dp rounded in both engines, so the weight
  *    trajectory is engine-exact (the mixEpochs fixed-round CTE
  *    mirror).
  *
  * Scale design (100 TB): the training frame is one narrow row per
  * document ([[NumFeatures]] doubles + label ≈ 90 bytes/doc), persisted
  * once and scanned [[TrainRounds]] times; each round's driver state is
  * ONE gradient vector (NumFeatures doubles — bounded by the feature
  * dimension, never the corpus). Labels read the stored
  * [[TrainingPrep.bigramScoredTable]] artifact, so the corpus-scale LM
  * scoring chain is not recomputed here. Scoring + apply are map-only
  * over the same frame with literal weights.
  */
object QualityClf {

  /** Hashed-token feature buckets (CCNet's hashed n-gram features,
    * bucketed small enough that the oracle's per-round CTEs stay
    * spellable). */
  val HashBuckets = 6
  /** Fixed GD rounds — the CTE-mirror knob, like mixEpochs'
    * RenormRounds. */
  val TrainRounds = 8
  /** Keep threshold for [[qualityApply]], on the 6-dp-rounded score
    * lattice (identical doubles in both engines, so the kept set is
    * engine-exact). Sits below the untrained 0.5 starting point: the
    * head tercile is the positive class, so scores concentrate around
    * its ≈1/3 base rate. */
  val Threshold = 0.34

  /** Bias + 3 quality signals + hashed buckets. */
  val NumFeatures: Int = 4 + HashBuckets

  /** The same stopword list as TextAnalysis.quality / the curation
    * pipeline's gate — feature x1 is that gate's stopword signal. */
  private val StopEn =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "on", "for")
  private def inListSql = StopEn.map(s => s"'$s'").mkString("(", ", ", ")")

  private val featNames: Seq[String] =
    Seq("x1", "x2", "x3") ++ (0 until HashBuckets).map(j => s"h$j")

  // ------------------------------------------------------- features --

  /** Per-document feature frame over the labeled population (docs with
    * ≥2 tokens — exactly the lmBuckets domain). All features are exact
    * integer ratios: deterministic per doc, identical across engines. */
  private def featureFrame(spark: SparkSession, dir: String): DataFrame =
    featuresOfDocs(Tables.documents(spark, dir))

  /** The same feature build over an ARBITRARY (doc_id, text, n_chars)
    * frame — the batch half of [[scoreDocs]] (the curateBatch
    * discipline: the stored-artifact builds and the per-batch passes
    * share one kernel, so a streamed doc scores exactly like a corpus
    * doc of the same text). */
  private def featuresOfDocs(input: DataFrame): DataFrame = {
    val docs = input
      .select(col("doc_id"), col("text"), col("n_chars"),
        split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
    // Hashed-bucket fractions computed INLINE per row: one md5 pass
    // over the token array (`hbs`, its own projection step so the
    // optimizer cannot inline the expensive transform into each
    // consumer) + one filter-count per bucket — all codegen'd
    // higher-order expressions. The r19 shape exploded every token
    // into a corpus-scale (doc_id, hb) stream, shuffled it through a
    // per-doc groupBy, and JOINED the result back onto the base
    // features — a full exchange + join for ratios that are a pure
    // function of the row (guide §2.4 "remove shuffles outright").
    // Arithmetic is identical: exact integer counts cast to double,
    // same division, so every feature is the same IEEE double.
    val hbExpr = Portable.hexToLongSpark("md5(x)", 1, 15)
    val hbCols = (0 until HashBuckets).map(j =>
      (expr(s"size(filter(hbs, b -> b = $j))").cast("double") /
        size(col("ws"))).as(s"h$j"))
    docs
      .withColumn("hbs",
        expr(s"transform(ws, x -> $hbExpr % $HashBuckets)"))
      .select(Seq(
        col("doc_id"),
        (size(expr(s"filter(ws, x -> x IN $inListSql)")).cast("double") /
          size(col("ws"))).as("x1"),
        (lit(1.0) - length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
          .cast("double") / col("n_chars")).as("x2"),
        (least(col("n_chars"), lit(500)).cast("double") / 500.0).as("x3")) ++
        hbCols: _*)
  }

  /** Score an arbitrary document batch under the STORED weights — no
    * retraining on the serving path (the appendScored frozen-LM rule
    * applied to the classifier): a batch doc scores exactly what a
    * corpus doc of the same text scores. Domain = docs with ≥2 tokens
    * (the classifier's training population). */
  private[graft] def scoreDocs(spark: SparkSession, dir: String,
      docs: DataFrame): DataFrame = {
    val w = trainedWeights(spark, dir)
    featuresOfDocs(docs).select(col("doc_id"),
      Num.roundEps(pExpr(w), 6).as("clf_score"))
  }

  /** Features ⋈ labels, cached per (session, corpus): the one frame
    * the GD rounds scan. */
  private def trainFrame(spark: SparkSession, dir: String): DataFrame =
    ArtifactCache.cached(spark, s"quality_train_$dir") {
      // RAW terciles: the persisted weights are keyed on corpus
      // content (fingerprint), so labels must be a pure function of
      // that content — a takedown recorded before first training must
      // not change what the same artifact name holds (r17 ADVICE)
      val labels = TrainingPrep.lmBucketsRaw(spark, dir)
        .select(col("doc_id"),
          when(col("bucket") === "head", 1.0).otherwise(0.0).as("y"))
      featureFrame(spark, dir).join(labels, "doc_id")
    }

  // ------------------------------------------------------- training --

  /** z = w·x with the bias term first, then the features in
    * [[featNames]] order — the same left-associated addition sequence
    * the oracle spells, so per-doc z is the identical IEEE double. */
  private def zExpr(w: Array[Double]): Column =
    featNames.zipWithIndex
      .map { case (f, j) => lit(w(j + 1)) * col(f) }
      .foldLeft(lit(w(0)) * lit(1.0))(_ + _)

  private def pExpr(w: Array[Double]): Column =
    lit(1.0) / (lit(1.0) + exp(-zExpr(w)))

  // per-(session, corpus) memo of the trained weight vector — training
  // is TrainRounds passes over the cached frame; score + apply reuse it
  private val wCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Array[Double]]]()

  private[pipeline] def clearCache(): Unit =
    wCache.synchronized(wCache.clear())

  /** The fixed-round GD trainer. Each round: one aggregation over the
    * cached frame → NumFeatures gradient scalars on the driver →
    * 6-dp-rounded weight update (both roundings mirrored in the oracle
    * CTE chain, so the trajectory is engine-exact). */
  private[pipeline] def trainedWeights(spark: SparkSession,
      dir: String): Array[Double] = {
    val perSession = wCache.synchronized {
      Option(wCache.get(spark)).getOrElse {
        val m = scala.collection.concurrent
          .TrieMap.empty[String, Array[Double]]
        wCache.put(spark, m)
        m
      }
    }
    perSession.getOrElseUpdate(dir, {
      // persisted like the PQ codebooks (persistedBook discipline):
      // the trained weights are a write-time artifact — a fresh
      // session reloads them instead of re-paying the TrainRounds
      // aggregation passes, and doubles round-trip parquet
      // bit-exactly so the reloaded model IS the trained model
      val tbl = qclfName(spark, dir)
      if (spark.catalog.tableExists(tbl)) {
        spark.table(tbl).collect()
          .map(r => (r.getInt(0), r.getDouble(1)))
          .sortBy(_._1).map(_._2)
      } else {
        val w = train(spark, dir)
        import spark.implicits._
        val path = graft.sources.TableIO.indexPath(tbl)
        w.zipWithIndex.map { case (v, j) => (j, v) }.toSeq
          .toDF("j", "w").coalesce(1)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .format("parquet").option("path", path).saveAsTable(tbl)
        w
      }
    })
  }

  private def qclfName(spark: SparkSession, dir: String): String =
    "graft_qclf_" + dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + Dedup.corpusFingerprint(spark, dir) +
      Registry.basisSuffix(spark, dir, Registry.Doc)

  /** The trained-weights artifact iff it exists in the CURRENT
    * generation, paired with its deterministic rebuild — the
    * [[Maintenance.refreshModels]] hook. */
  private[pipeline] def genArtifacts(spark: SparkSession,
      dir: String): Seq[(String, () => Unit)] = {
    val t = qclfName(spark, dir)
    if (spark.catalog.tableExists(t))
      Seq((t, () => { trainedWeights(spark, dir); () }))
    else Nil
  }

  /** The actual TrainRounds GD loop (runs once per corpus content, at
    * artifact-build time). */
  private def train(spark: SparkSession, dir: String): Array[Double] = {
    val train = trainFrame(spark, dir)
    var w = Array.fill(NumFeatures)(0.0)
    for (_ <- 1 to TrainRounds) {
      val gradCols = (lit(1.0) +: featNames.map(col)).zipWithIndex.map {
        case (x, j) =>
          Num.roundEps(avg((col("p") - col("y")) * x), 6).as(s"g$j")
      }
      val row: Row = train.withColumn("p", pExpr(w))
        .agg(gradCols.head, gradCols.tail: _*).head()
      w = w.indices.map(j =>
        Num.roundEpsJvm(w(j) - row.getDouble(j), 6)).toArray
    }
    w
  }

  // -------------------------------------------------------- queries --

  /** Per-document classifier output: the label it was trained against
    * and the 6-dp-rounded logistic score under the final weights. */
  def qualityClf(spark: SparkSession, dir: String): DataFrame = {
    val w = trainedWeights(spark, dir)
    trainFrame(spark, dir).select(col("doc_id"),
      col("y").cast("long").as("label"),
      Num.roundEps(pExpr(w), 6).as("clf_score"))
  }

  /** The APPLY step: documents whose trained score clears
    * [[Threshold]], with their catalog columns — the
    * docs_dedup_apply-style complete-the-loop pass. The filtered id
    * set joins back to the corpus scan on doc_id (AQE broadcasts it
    * while it fits). */
  def qualityApply(spark: SparkSession, dir: String): DataFrame = {
    val kept = qualityClf(spark, dir)
      .filter(col("clf_score") >= Threshold)
      .select(col("doc_id"), col("clf_score"))
    Tables.documents(spark, dir).join(kept, "doc_id")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        col("clf_score"))
  }

  // -------------------------------------------------------- oracles --

  /** The z spelling with weights from CTE alias `w` — must match
    * [[zExpr]]'s association order term for term. */
  private def zSql: String =
    (Seq("w.w0 * 1.0") ++ featNames.zipWithIndex.map {
      case (f, j) => s"w.w${j + 1} * $f"
    }).mkString("(", " + ", ")")

  private def pSql: String = s"1.0 / (1.0 + exp(-$zSql))"

  /** Everything from the lm-chain through the trained final weights
    * w[[TrainRounds]]: labels, features, the cached train frame, and
    * one (p, gradient, weights) CTE triple per GD round. MATERIALIZED
    * where a CTE is referenced by every later round (the mixEpochs
    * inlining lesson — OracleCteSpec pins the bound). */
  private def clfChainSql: String = {
    val xs = Seq("1.0", "x1", "x2", "x3") ++
      (0 until HashBuckets).map(j => s"h$j")
    val hbCols = (0 until HashBuckets).map(j =>
      s"    CAST(sum(CASE WHEN hb = $j THEN 1 ELSE 0 END) AS DOUBLE)" +
        s" / count(*) AS h$j").mkString(",\n")
    val w0Cols = (0 until NumFeatures).map(j => s"0.0 AS w$j")
      .mkString(", ")
    val rounds = (1 to TrainRounds).map { r =>
      val gCols = xs.zipWithIndex.map { case (x, j) =>
        s"    round(avg((p - y) * $x) + 1e-9, 6) AS g$j"
      }.mkString(",\n")
      val wCols = (0 until NumFeatures).map(j =>
        s"    round(w.w$j - g.g$j + 1e-9, 6) AS w$j").mkString(",\n")
      s"""p$r AS (
         |  SELECT t.*, $pSql AS p
         |  FROM tr t CROSS JOIN w${r - 1} w),
         |g$r AS MATERIALIZED (
         |  SELECT
         |$gCols
         |  FROM p$r),
         |w$r AS MATERIALIZED (
         |  SELECT
         |$wCols
         |  FROM w${r - 1} w CROSS JOIN g$r g)""".stripMargin
    }.mkString(",\n")
    s"""${TrainingPrep.lmChainSql},
       |lbl AS MATERIALIZED (
       |  SELECT scored.doc_id,
       |    CASE WHEN c.better < (nn.n + 2) // 3 THEN 1.0 ELSE 0.0 END AS y
       |  FROM scored JOIN cum c ON scored.avg_logprob = c.s
       |  CROSS JOIN nn),
       |fb AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(ws, x -> x IN $inListSql)) AS DOUBLE)
       |      / len(ws) AS x1,
       |    1.0 - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
       |      AS DOUBLE) / n_chars AS x2,
       |    CAST(least(n_chars, 500) AS DOUBLE) / 500.0 AS x3
       |  FROM (SELECT doc_id, text, n_chars, string_split(text, ' ') AS ws
       |        FROM documents)
       |  WHERE len(ws) >= 2),
       |ht AS (
       |  SELECT doc_id,
       |    ${Portable.hexToLongSql("md5(token)", 1, 15)} % $HashBuckets AS hb
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |        FROM documents WHERE len(string_split(text, ' ')) >= 2)),
       |fh AS (
       |  SELECT doc_id,
       |$hbCols
       |  FROM ht GROUP BY doc_id),
       |tr AS MATERIALIZED (
       |  SELECT fb.doc_id, x1, x2, x3,
       |    ${(0 until HashBuckets).map(j => s"h$j").mkString(", ")}, y
       |  FROM fb JOIN fh USING (doc_id) JOIN lbl USING (doc_id)),
       |w0 AS (SELECT $w0Cols),
       |$rounds""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "text_quality_clf" ->
      s"""WITH $clfChainSql
         |SELECT t.doc_id, CAST(y AS BIGINT) AS label,
         |  round($pSql + 1e-9, 6) AS clf_score
         |FROM tr t CROSS JOIN w$TrainRounds w""".stripMargin,
    "docs_quality_apply" ->
      s"""WITH $clfChainSql,
         |sc AS (
         |  SELECT t.doc_id, round($pSql + 1e-9, 6) AS clf_score
         |  FROM tr t CROSS JOIN w$TrainRounds w)
         |SELECT d.doc_id, d.source, d.lang, d.n_chars, sc.clf_score
         |FROM documents d JOIN sc USING (doc_id)
         |WHERE sc.clf_score >= $Threshold""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_quality_clf" -> (qualityClf _),
    "docs_quality_apply" -> (qualityApply _)
  )
}
