package graft.pipeline

import graft.{Num, Tables}
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language-ID heuristic, rolling-hash fingerprinting.
  *
  * All per-document scalar work — embarrassingly parallel map-only
  * plans (no shuffle at any scale); every expression is a codegen'd
  * built-in, never a Scala UDF.
  */
object TextAnalysis {

  private[pipeline] val StopEn = Seq("the", "a", "of", "to", "and", "in", "is", "it", "on", "for")
  private[pipeline] val StopDe = Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit")
  private[pipeline] val StopEs = Seq("el", "la", "los", "y", "es", "un", "una", "por")
  private[pipeline] val StopFr = Seq("le", "la", "les", "et", "est", "un", "une", "pour")

  private[pipeline] def inList(xs: Seq[String]) = xs.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Whitespace + regex token counts. */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_tokens"),
      size(array_distinct(split(col("text"), " "))).as("n_uniq"),
      size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("n_alnum"))

  /** Quality signals: length, punctuation ratio, stopword ratio, and a
    * blended score — the usual pretraining-corpus heuristics. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("n", length(col("text")))
      .withColumn("nt", size(split(col("text"), " ")))
      .withColumn("npunct",
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")))
      .withColumn("nstop",
        size(expr(s"filter(split(text, ' '), x -> x IN ${inList(StopEn)})")))
      // nullif: degenerate (empty) docs score NULL identically in both
      // engines rather than relying on divide-by-zero semantics
      .withColumn("punct_ratio",
        col("npunct").cast("double") / nullif(col("n"), lit(0)))
      .withColumn("stop_ratio",
        col("nstop").cast("double") / nullif(col("nt"), lit(0)))
    d.select(
      col("doc_id"), col("n").as("n_chars"),
      Num.roundEps(col("punct_ratio"), 6).as("punct_ratio"),
      Num.roundEps(col("stop_ratio"), 6).as("stop_ratio"),
      Num.roundEps(
        col("stop_ratio") * 0.5 + (lit(1.0) - col("punct_ratio")) * 0.3 +
          least(col("n"), lit(500)).cast("double") / 500.0 * 0.2,
        6).as("quality_score"))
  }

  /** Stopword-count language heuristic (scores per language, argmax with
    * a deterministic tie order). */
  def langid(spark: SparkSession, dir: String): DataFrame = {
    def score(xs: Seq[String]) =
      expr(s"size(filter(split(text, ' '), x -> x IN ${inList(xs)}))")
    Tables.documents(spark, dir)
      .withColumn("s_en", score(StopEn)).withColumn("s_de", score(StopDe))
      .withColumn("s_es", score(StopEs)).withColumn("s_fr", score(StopFr))
      .select(col("doc_id"), col("lang").as("stored_lang"),
        expr(
          """CASE
            | WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
            | WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
            | WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
            | WHEN s_fr > 0 THEN 'fr'
            | ELSE 'unknown' END""".stripMargin).as("pred_lang"))
  }

  /** Polynomial rolling-hash fingerprint of the first 64 chars
    * (Σ ascii(c_i)·31^(i-1) mod 1e9+7) — document identity that is
    * stable across engines, unlike engine-local hash functions.
    * Computed by the native Fingerprint31 kernel (one codegen'd loop
    * per row); the interpreted 64-iteration `aggregate` HOF it replaces
    * was the exact pattern SURVEY §5 item 1 warns against. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      graft.functions.HashFunctions.fingerprint31(col("text")).as("fp"))

  /** Corpus vocabulary: top-50 tokens by global frequency (tie-broken
    * lexically) — explode + count, one shuffle. */
  /** Corpus unigram counts — ONE tokenization convention shared by
    * vocab and the bigram LM denominator, so the two can never drift. */
  private def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))

  def vocab(spark: SparkSession, dir: String): DataFrame =
    tokenCounts(spark, dir)
      .orderBy(col("cnt").desc, col("token"))
      .limit(50)

  /** Bigram LM table — the n-gram step past text_unigram_logprob:
    * corpus bigram counts with the conditional log-probability
    * ln(c(w1,w2) / c(w1)) against the unigram totals, top 50 by count
    * (ties closed by the (w1, w2) lexical order so the cut is
    * deterministic cross-engine).
    *
    * Adjacency is DOCUMENT-LOCAL, so it is built map-side with native
    * slice + arrays_zip (codegen'd collection functions, not lambda
    * HOFs — SURVEY §5 item 1) and goes straight into a two-level hash
    * aggregation: no shuffle ever carries the token stream (a lead()
    * window spelling measured 18.2 s at sf10 — it shuffles all ~50M
    * tokens on doc_id just to pair neighbors that were already
    * adjacent in the array). The count-table join is vocab-sized on
    * each side, independent of corpus row count at 100 TB. */
  def bigrams(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("ws"))
      .withColumn("n1", greatest(size(col("ws")) - 1, lit(0)))
      .withColumn("a", slice(col("ws"), lit(1), col("n1")))
      .withColumn("b", slice(col("ws"), lit(2), col("n1")))
    val bc = docs
      .select(explode(arrays_zip(col("a"), col("b"))).as("p"))
      .groupBy(col("p.a").as("w1"), col("p.b").as("w2"))
      .agg(count(lit(1)).as("cnt"))
    val uc = tokenCounts(spark, dir)
      .select(col("token").as("w1"), col("cnt").as("c1"))
    bc.join(uc, "w1")
      .select(col("w1"), col("w2"), col("cnt"),
        Num.roundEps(log(col("cnt").cast("double") / col("c1")), 6).as("logp"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(50)
  }

  /** Repetition signals (the Gopher-rules family): duplicate-word
    * fraction plus the corpus-classic "most frequent word / bigram
    * share" — high values flag boilerplate and degenerate generations.
    *
    * The per-doc mode counts go through explode + two-level hash
    * aggregation (shuffle key = (doc_id, token), map-side combine) —
    * NOT a per-row interpreted HOF loop (SURVEY §5 item 1); the
    * duplicate-word fraction is pure map-side array arithmetic. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("nw", size(col("ws")))
    def topShare(tokens: DataFrame, n: String, out: String): DataFrame =
      tokens
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("cnt"), first(col(n)).as(n))
        .groupBy(col("doc_id"))
        .agg((max(col("cnt")).cast("double") / first(col(n))).as(out))
    val words = topShare(
      base.select(col("doc_id"), col("nw"), explode(col("ws")).as("tok")),
      "nw", "top_word_share")
    val bigrams = topShare(
      base.filter(col("nw") >= 2)
        .select(col("doc_id"), (col("nw") - 1).as("nb"),
          explode(expr(
            """transform(sequence(1, size(ws) - 1),
              |  i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"""
              .stripMargin)).as("tok")),
      "nb", "top_bigram_share")
    base
      .withColumn("dup_word_frac",
        lit(1.0) - size(array_distinct(col("ws"))).cast("double") /
          nullif(col("nw"), lit(0)))
      .join(words, "doc_id")
      .join(bigrams, "doc_id")
      .select(col("doc_id"), col("nw").as("n_words"),
        Num.roundEps(col("dup_word_frac"), 6).as("dup_word_frac"),
        Num.roundEps(col("top_word_share"), 6).as("top_word_share"),
        Num.roundEps(col("top_bigram_share"), 6).as("top_bigram_share"))
  }

  val oracles: Map[String, String] = {
    val pows = Portable.Pow31.mkString("[", ", ", "]")
    Map(
      "text_repetition" ->
        """WITH base AS (
          |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          |words AS (
          |  SELECT doc_id, max(cnt) AS maxw FROM (
          |    SELECT doc_id, w, count(*) AS cnt
          |    FROM (SELECT doc_id, unnest(ws) AS w FROM base)
          |    GROUP BY doc_id, w)
          |  GROUP BY doc_id),
          |bigrams AS (
          |  SELECT doc_id, max(cnt) AS maxb FROM (
          |    SELECT doc_id, b, count(*) AS cnt
          |    FROM (SELECT doc_id, unnest(list_transform(
          |        generate_series(1, len(ws) - 1),
          |        i -> ws[i] || ' ' || ws[i + 1])) AS b
          |      FROM base WHERE len(ws) >= 2)
          |    GROUP BY doc_id, b)
          |  GROUP BY doc_id)
          |SELECT b.doc_id, len(ws) AS n_words,
          |  round((1.0 - CAST(len(list_distinct(ws)) AS DOUBLE)
          |    / nullif(len(ws), 0)) + 1e-9, 6) AS dup_word_frac,
          |  round((CAST(maxw AS DOUBLE) / len(ws)) + 1e-9, 6) AS top_word_share,
          |  round((CAST(maxb AS DOUBLE) / (len(ws) - 1)) + 1e-9, 6) AS top_bigram_share
          |FROM base b JOIN words USING (doc_id) JOIN bigrams USING (doc_id)"""
          .stripMargin,
      "text_vocab" ->
        """SELECT token, count(*) AS cnt
          |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
          |GROUP BY token ORDER BY cnt DESC, token LIMIT 50""".stripMargin,
      "text_bigrams" ->
        """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          |toks AS (SELECT doc_id, generate_subscripts(ws, 1) AS i,
          |                unnest(ws) AS w FROM d),
          |big AS (SELECT a.w AS w1, b.w AS w2 FROM toks a
          |        JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
          |bc AS (SELECT w1, w2, count(*) AS cnt FROM big GROUP BY 1, 2),
          |uc AS (SELECT w AS w1, count(*) AS c1 FROM toks GROUP BY 1)
          |SELECT w1, w2, cnt,
          |  round(ln(CAST(cnt AS DOUBLE) / c1) + 1e-9, 6) AS logp
          |FROM bc JOIN uc USING (w1)
          |ORDER BY cnt DESC, w1, w2 LIMIT 50""".stripMargin,
      "text_tokens" ->
        """SELECT doc_id,
          |  len(string_split(text, ' ')) AS n_tokens,
          |  len(list_distinct(string_split(text, ' '))) AS n_uniq,
          |  len(regexp_extract_all(text, '[a-z0-9]+')) AS n_alnum
          |FROM documents""".stripMargin,
      "text_quality" ->
        s"""WITH q AS (
           |  SELECT doc_id, length(text) AS n,
           |    len(string_split(text, ' ')) AS nt,
           |    length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS npunct,
           |    len(list_filter(string_split(text, ' '), x -> x IN ${inList(StopEn)})) AS nstop
           |  FROM documents)
           |SELECT doc_id, n AS n_chars,
           |  round((CAST(npunct AS DOUBLE) / nullif(n, 0)) + 1e-9, 6) AS punct_ratio,
           |  round((CAST(nstop AS DOUBLE) / nullif(nt, 0)) + 1e-9, 6) AS stop_ratio,
           |  round((CAST(nstop AS DOUBLE) / nullif(nt, 0) * 0.5
           |    + (1.0 - CAST(npunct AS DOUBLE) / nullif(n, 0)) * 0.3
           |    + CAST(least(n, 500) AS DOUBLE) / 500.0 * 0.2) + 1e-9, 6) AS quality_score
           |FROM q""".stripMargin,
      "text_langid" ->
        s"""WITH s AS (
           |  SELECT doc_id, lang,
           |    len(list_filter(string_split(text, ' '), x -> x IN ${inList(StopEn)})) AS s_en,
           |    len(list_filter(string_split(text, ' '), x -> x IN ${inList(StopDe)})) AS s_de,
           |    len(list_filter(string_split(text, ' '), x -> x IN ${inList(StopEs)})) AS s_es,
           |    len(list_filter(string_split(text, ' '), x -> x IN ${inList(StopFr)})) AS s_fr
           |  FROM documents)
           |SELECT doc_id, lang AS stored_lang,
           |  CASE
           |    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
           |    WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
           |    WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
           |    WHEN s_fr > 0 THEN 'fr'
           |    ELSE 'unknown' END AS pred_lang
           |FROM s""".stripMargin,
      "text_fingerprint" ->
        s"""SELECT doc_id,
           |  CAST(list_sum(list_transform(generate_series(1, least(length(text), 64)),
           |    i -> (CAST(ascii(text[i]) AS BIGINT) * ($pows[i])) % ${Portable.FpMod})) % ${Portable.FpMod} AS BIGINT) AS fp
           |FROM documents""".stripMargin
    )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_vocab" -> (vocab _),
    "text_bigrams" -> (bigrams _),
    "text_tokens" -> (tokens _),
    "text_quality" -> (quality _),
    "text_langid" -> (langid _),
    "text_fingerprint" -> (fingerprint _),
    "text_repetition" -> (repetition _)
  )
}
