package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The JPEG multimodal family's load-bearing assumption, pinned: a
  * UNIFORM 8×8 block is DC-only, and at quality 1.0 the quantized DC
  * survives the inverse DCT exactly — so the lossy codec is
  * bit-deterministic on these payloads and the closed-form DuckDB
  * oracle is sound. If a JDK codec change ever breaks the exactness,
  * this spec names the failure; the oracle would only report a hash
  * mismatch. */
class JpegAssetSpec extends SparkSpec {

  test("every gray value 0..255 round-trips a uniform block exactly") {
    (0 until 256).foreach { v =>
      val payload = Multimodal.encodeJpeg(
        Array.fill(Multimodal.JpegBlocks * Multimodal.JpegBlocks)(v))
      val img = Multimodal.decodeJpeg(payload)
      assert((img.getWidth, img.getHeight) ===
        (Multimodal.JpegW, Multimodal.JpegH))
      for (y <- 0 until Multimodal.JpegH; x <- 0 until Multimodal.JpegW)
        assert(img.getRaster.getSample(x, y, 0) === v,
          s"gray $v decoded wrong at ($x,$y)")
    }
  }

  test("distinct block values decode independently (no cross-block bleed)") {
    val vals = Array(0, 255, 17, 204)
    val img = Multimodal.decodeJpeg(Multimodal.encodeJpeg(vals))
    for (by <- 0 until 2; bx <- 0 until 2; dy <- 0 until 8; dx <- 0 until 8)
      assert(img.getRaster.getSample(bx * 8 + dx, by * 8 + dy, 0) ===
        vals(by * 2 + bx), s"block ($bx,$by) offset ($dx,$dy)")
  }

  test("payloads are real baseline JFIF streams") {
    val b = Multimodal.encodeJpeg(Array(1, 2, 3, 4))
    assert((b(0) & 0xff, b(1) & 0xff, b(2) & 0xff, b(3) & 0xff) ===
      (0xff, 0xd8, 0xff, 0xe0)) // SOI + APP0/JFIF
    assert((b(b.length - 2) & 0xff, b(b.length - 1) & 0xff) === (0xff, 0xd9)) // EOI
  }

  test("jpeg_meta / jpeg_features agree with a direct per-doc recompute") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), unhex(md5(col("text"))).as("h"))
      .limit(20).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val meta = Multimodal.jpegMeta(spark, sfDir)
      .filter(col("doc_id").isin(docs.keys.toSeq: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("px_sum")).toMap
    docs.foreach { case (id, h) =>
      val expect = 64L * (0 until 4).map(i => (h(i) & 0xff).toLong).sum
      assert(meta(id) === expect, s"doc $id")
    }
  }
}
