package graft.pipeline

import graft.Tables
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata, decoded batch-wise inside executors.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * deterministic STUB (header parse of the bytes); everything around it
  * — binary column schema, partition-parallel `mapPartitions` batch
  * shape, typed Encoders — is the real plumbing a decode/resize/
  * feature-extract stage would use. In PySpark this stage would be
  * `mapInPandas`; the Scala-native equivalent is a typed mapPartitions
  * over the Dataset, which keeps the whole stage in one map-only task
  * per input partition (no shuffle, no driver collect).
  */
object Multimodal {

  /** One "asset" row: fake payload bytes derived from the document. */
  final case class Asset(doc_id: Long, payload: Array[Byte])

  /** Decoded metadata — what a real image decoder would emit. */
  final case class AssetMeta(doc_id: Long, n_bytes: Int,
      magic: Long, width: Long, height: Long)

  /** The stubbed decoder: big-endian header parse of the payload.
    * A real decoder (JPEG dims, audio sample rate) slots in here with
    * the same signature — bytes in, typed metadata out.
    */
  def decodeStub(a: Asset): AssetMeta = {
    val b = a.payload
    def be(off: Int, n: Int): Long =
      (0 until n).foldLeft(0L)((acc, i) => (acc << 8) | (b(off + i) & 0xffL))
    AssetMeta(a.doc_id, b.length, be(0, 4), be(4, 2), be(6, 2))
  }

  /** Binary-column pipeline: synthesize payloads (md5 bytes of the
    * text — deterministic), then batch-decode via mapPartitions. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val assets: Dataset[Asset] = Tables.documents(spark, dir)
      .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))
      .as[Asset]
    assets.mapPartitions(_.map(decodeStub)).toDF()
  }

  /** Per-asset feature vector emitted by the (stubbed) extractor. */
  final case class AssetFeatures(doc_id: Long, features: Array[Double])

  /** The stubbed feature extractor: normalized byte intensities — the
    * shape (binary in, fixed-dim double[] out, batch-wise on executors)
    * that a real embedding/CNN stage uses; its output feeds directly
    * into the Similarity operators (same Array[Double] contract). */
  def featureStub(a: Asset): AssetFeatures =
    AssetFeatures(a.doc_id, a.payload.map(b => (b & 0xff) / 255.0))

  /** Binary → feature-vector stage, exploded to (doc_id, pos, feat)
    * rows for the cross-engine check. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val assets: Dataset[Asset] = Tables.documents(spark, dir)
      .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))
      .as[Asset]
    assets.mapPartitions(_.map(featureStub)).toDF()
      .select(col("doc_id"), posexplode(col("features")).as(Seq("p0", "v")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        graft.Num.roundEps(col("v"), 6).as("feat"))
  }

  /** One output pixel of the resize stage. */
  final case class ResizedAsset(doc_id: Long, y: Long, x: Long, mean_px: Double)

  /** The stubbed resize: the 16-byte payload is a 4×4 grayscale image,
    * area-averaged down to 2×2 (each output pixel = mean of its 2×2
    * source block) — the exact arithmetic of an area-interpolation
    * downscale, over real bytes; a codec-backed decode feeds the same
    * pixel-grid-in, pixel-grid-out shape. */
  def resizeStub(a: Asset): Seq[ResizedAsset] = {
    val px = a.payload.map(_ & 0xff)
    for (by <- 0 until 2; bx <- 0 until 2) yield {
      val s = (for (dy <- 0 until 2; dx <- 0 until 2)
        yield px((by * 2 + dy) * 4 + (bx * 2 + dx))).sum
      ResizedAsset(a.doc_id, by.toLong, bx.toLong, s / 4.0)
    }
  }

  /** Binary → resized-pixel-grid stage (mapPartitions, map-only like
    * the other multimodal passes). */
  def resize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val assets: Dataset[Asset] = Tables.documents(spark, dir)
      .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))
      .as[Asset]
    assets.mapPartitions(_.flatMap(resizeStub)).toDF()
      .select(col("doc_id"), col("y"), col("x"),
        graft.Num.roundEps(col("mean_px"), 6).as("mean_px"))
  }

  private val resizeSql = {
    // the same 2×2 block means, re-derived from the md5 hex: source
    // pixel (r, c) is byte r*4+c of the payload
    def pxSql(r: Int, c: Int) =
      Portable.hexToLongSql("md5(text)", 1 + 2 * (r * 4 + c), 2)
    val cells = for (by <- 0 until 2; bx <- 0 until 2) yield {
      val sum = (for (dy <- 0 until 2; dx <- 0 until 2)
        yield pxSql(by * 2 + dy, bx * 2 + dx)).mkString(" + ")
      s"($sum) / 4.0"
    }
    val ys = Seq(0, 0, 1, 1).mkString("[", ", ", "]")
    val xs = Seq(0, 1, 0, 1).mkString("[", ", ", "]")
    s"""SELECT doc_id, y, x, round(v + 1e-9, 6) AS mean_px FROM (
       |  SELECT doc_id,
       |    unnest(CAST($ys AS BIGINT[])) AS y,
       |    unnest(CAST($xs AS BIGINT[])) AS x,
       |    unnest([${cells.mkString(",\n      ")}]) AS v
       |  FROM documents)""".stripMargin
  }

  /** Frame stride for the video-style sampling pass. */
  val FrameBytes = 4
  val NFrames = 12
  val FrameStride = 3

  /** Video-style frame sampling over a binary payload: the payload (48
    * deterministic bytes = three md5 blocks of the doc text) is treated
    * as `NFrames` fixed-size frames; every `FrameStride`-th frame is
    * sliced out of the BINARY column (map-side explode + substring —
    * the real plumbing a frame-decode stage feeds) and digested. The
    * per-frame digest runs over the frame's hex form because the oracle
    * engine's md5 is VARCHAR-only; the slicing itself is byte-level. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(unhex(md5(col("text"))),
          unhex(md5(concat(col("text"), lit("a")))),
          unhex(md5(concat(col("text"), lit("b"))))).as("payload"))
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), lit(NFrames - 1), lit(FrameStride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        lower(hex(expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)")))
          .as("frame_hex"))
      .withColumn("frame_digest", md5(col("frame_hex")))

  private val frameSampleSql = {
    val idxs = (0 until NFrames by FrameStride).mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |  CAST(frame_idx AS BIGINT) AS frame_idx,
       |  substring(hexstr, frame_idx * ${2 * FrameBytes} + 1, ${2 * FrameBytes}) AS frame_hex,
       |  md5(substring(hexstr, frame_idx * ${2 * FrameBytes} + 1, ${2 * FrameBytes})) AS frame_digest
       |FROM (
       |  SELECT doc_id,
       |    md5(text) || md5(text || 'a') || md5(text || 'b') AS hexstr,
       |    unnest($idxs) AS frame_idx
       |  FROM documents)""".stripMargin
  }

  /** The oracles re-derive the same bytes arithmetically from the md5
    * hex — validating that the JVM byte-level decode path and schema
    * survived intact. */
  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      s"""SELECT doc_id, 16 AS n_bytes,
         |  ${Portable.hexToLongSql("md5(text)", 1, 8)} AS magic,
         |  ${Portable.hexToLongSql("md5(text)", 9, 4)} AS width,
         |  ${Portable.hexToLongSql("md5(text)", 13, 4)} AS height
         |FROM documents""".stripMargin,
    "mm_features" -> {
      val exprs = (0 until 16)
        .map(i => s"${Portable.hexToLongSql("md5(text)", 1 + 2 * i, 2)} / 255.0")
        .mkString("[", ",\n    ", "]")
      s"""SELECT doc_id, pos, round(v + 1e-9, 6) AS feat FROM (
         |  SELECT doc_id,
         |    unnest(CAST(generate_series(1, 16) AS BIGINT[])) AS pos,
         |    unnest($exprs) AS v
         |  FROM documents)""".stripMargin
    },
    "mm_frame_sample" -> frameSampleSql,
    "mm_resize" -> resizeSql
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (binaryMeta _),
    "mm_features" -> (features _),
    "mm_frame_sample" -> (frameSample _),
    "mm_resize" -> (resize _)
  )
}
