package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{Adler32, CRC32}

import org.scalatest.funsuite.AnyFunSuite

/** Codec-level coverage for the pure-JVM PNG implementation backing the
  * mm_* multimodal operators: lossless round trips over every filter
  * type and color type, a hand-assembled spec-conformant fixture built
  * WITHOUT the encoder (so decode is checked against the PNG spec, not
  * against our own writer), container splitting, and the error surface.
  */
class PngSpec extends AnyFunSuite {

  private def pixels(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 131 + seed * 31 + (i * i % 97)) % 256).toByte)

  test("gray round trip, stored and compressed, sizes that hit all five filters") {
    for {
      (w, h) <- Seq((1, 1), (4, 4), (7, 3), (3, 11), (64, 64))
      stored <- Seq(true, false)
    } {
      val px = pixels(w * h, w * 100 + h)
      val img = Png.decode(Png.encodeGray(w, h, px, stored))
      assert(img.width == w && img.height == h && img.colorType == 0)
      assert(img.pixels.toSeq == px.toSeq, s"w=$w h=$h stored=$stored")
    }
  }

  test("RGB and RGBA round trips (multi-byte pixels drive bpp-offset filter paths)") {
    for ((ct, bpp) <- Seq((2, 3), (6, 4), (4, 2))) {
      val w = 5; val h = 7
      val px = pixels(w * h * bpp, ct)
      val img = Png.decode(Png.encode(w, h, ct, px, stored = false))
      assert(img.colorType == ct && img.bpp == bpp)
      assert(img.pixels.toSeq == px.toSeq)
    }
  }

  test("stored-mode payload length matches the closed form the oracle uses") {
    for ((w, h) <- Seq((4, 4), (2, 2), (16, 16), (300, 300))) {
      val enc = Png.encodeGray(w, h, pixels(w * h, 1), stored = true)
      assert(enc.length == Png.storedGraySize(w, h), s"${w}x$h")
      assert(Png.decode(enc).pixels.length == w * h)
    }
  }

  // -- hand-assembled fixture: decode must follow the spec, not our encoder --

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def be(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    out.write(be(data.length)); out.write(typ.getBytes("US-ASCII"))
    out.write(data)
    val crc = new CRC32(); crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    out.write(be(crc.getValue.toInt))
    out.toByteArray
  }

  private def zlibStoredRaw(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0x78); out.write(0x01)
    out.write(0x01) // BFINAL=1, BTYPE=00
    out.write(data.length & 0xff); out.write((data.length >> 8) & 0xff)
    out.write(~data.length & 0xff); out.write((~data.length >> 8) & 0xff)
    out.write(data)
    val ad = new Adler32(); ad.update(data); val a = ad.getValue
    out.write((a >> 24).toInt & 0xff); out.write((a >> 16).toInt & 0xff)
    out.write((a >> 8).toInt & 0xff); out.write(a.toInt & 0xff)
    out.toByteArray
  }

  private def ihdr(w: Int, h: Int, colorType: Int, interlace: Int = 0): Array[Byte] = {
    val d = new ByteArrayOutputStream()
    def be(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    d.write(be(w)); d.write(be(h))
    d.write(8); d.write(colorType); d.write(0); d.write(0); d.write(interlace)
    d.toByteArray
  }

  /** 3 rows of 3 gray pixels, rows filtered Sub / Up / Paeth, filtered
    * bytes computed by hand per RFC 2083 §6 — decoding this proves the
    * defilter math independently of the encoder. */
  test("hand-assembled PNG with Sub/Up/Paeth rows decodes to the spec'd pixels") {
    val raw = Array(
      10, 20, 30, // row 0
      40, 60, 80, // row 1
      90, 85, 200) // row 2
    // Sub on row 0 (left neighbor a): 10-0, 20-10, 30-20
    // Up on row 1 (above b): 40-10, 60-20, 80-30
    // Paeth on row 2: a=left(cur), b=above, c=above-left
    //  x=0: a=0 b=40 c=0   -> p=40, pa=40 pb=0  -> pred b=40,  90-40 = 50
    //  x=1: a=90 b=60 c=40 -> p=110, pa=20 pb=50 pc=70 -> pred a=90, 85-90 = -5
    //  x=2: a=85 b=80 c=60 -> p=105, pa=20 pb=25 pc=45 -> pred a=85, 200-85 = 115
    val filtered = Array[Int](
      1, 10, 10, 10,
      2, 30, 40, 50,
      4, 50, -5 & 0xff, 115).map(_.toByte)
    val png = Png.Signature ++ chunk("IHDR", ihdr(3, 3, 0)) ++
      chunk("IDAT", zlibStoredRaw(filtered)) ++ chunk("IEND", Array.emptyByteArray)
    val img = Png.decode(png)
    assert(img.pixels.map(_ & 0xff).toSeq == raw.toSeq)
  }

  test("ancillary chunks are skipped but still CRC-verified") {
    val filtered = Array[Byte](0, 7, 8) // one row, filter None
    val good = Png.Signature ++ chunk("IHDR", ihdr(2, 1, 0)) ++
      chunk("tEXt", "comment".getBytes("US-ASCII")) ++
      chunk("IDAT", zlibStoredRaw(filtered)) ++ chunk("IEND", Array.emptyByteArray)
    assert(Png.decode(good).pixels.map(_ & 0xff).toSeq == Seq(7, 8))
    val corrupt = good.clone()
    // flip a byte inside the tEXt payload without fixing its CRC
    val textOff = 8 + (12 + 13) + 8
    corrupt(textOff) = (corrupt(textOff) ^ 0x01).toByte
    val e = intercept[Png.PngError](Png.decode(corrupt))
    assert(e.getMessage.contains("CRC"))
  }

  test("IDAT split across multiple chunks concatenates before inflate") {
    val filtered = Array[Byte](0, 1, 2, 0, 3, 4) // 2x2 gray, filter None
    val z = zlibStoredRaw(filtered)
    val (z1, z2) = z.splitAt(5)
    val png = Png.Signature ++ chunk("IHDR", ihdr(2, 2, 0)) ++
      chunk("IDAT", z1) ++ chunk("IDAT", z2) ++ chunk("IEND", Array.emptyByteArray)
    assert(Png.decode(png).pixels.map(_ & 0xff).toSeq == Seq(1, 2, 3, 4))
  }

  test("error surface: signature, interlace, bit depth, truncation, filter type, trailing") {
    val px = pixels(16, 3)
    val ok = Png.encodeGray(4, 4, px, stored = true)
    val badSig = ok.clone(); badSig(0) = 0x42
    assert(intercept[Png.PngError](Png.decode(badSig)).getMessage.contains("signature"))

    val interlaced = Png.Signature ++ chunk("IHDR", ihdr(2, 2, 0, interlace = 1)) ++
      chunk("IDAT", zlibStoredRaw(Array[Byte](0, 1, 2, 0, 3, 4))) ++
      chunk("IEND", Array.emptyByteArray)
    assert(intercept[Png.PngError](Png.decode(interlaced)).getMessage.contains("interlace"))

    val d16 = ihdr(2, 2, 0); d16(8) = 16
    val deep = Png.Signature ++ chunk("IHDR", d16) ++ chunk("IEND", Array.emptyByteArray)
    assert(intercept[Png.PngError](Png.decode(deep)).getMessage.contains("bit depth"))

    assert(intercept[Png.PngError](Png.decode(ok.take(ok.length - 4)))
      .getMessage.contains("truncated"))

    val badFilter = Png.Signature ++ chunk("IHDR", ihdr(2, 1, 0)) ++
      chunk("IDAT", zlibStoredRaw(Array[Byte](9, 1, 2))) ++
      chunk("IEND", Array.emptyByteArray)
    assert(intercept[Png.PngError](Png.decode(badFilter)).getMessage.contains("filter type"))

    assert(intercept[Png.PngError](Png.decode(ok ++ Array[Byte](1)))
      .getMessage.contains("trailing"))
  }

  test("decodeFrames splits a concatenated container by chunk framing") {
    val frames = (0 until 5).map(f => Png.encodeGray(2, 2, pixels(4, f), f % 2 == 0))
    val container = frames.reduce(_ ++ _)
    val decoded = Png.decodeFrames(container)
    assert(decoded.length == 5)
    decoded.zipWithIndex.foreach { case (img, f) =>
      assert(img.pixels.toSeq == pixels(4, f).toSeq, s"frame $f")
    }
  }

  test("skipAt lands exactly where decodeAt does, for every frame boundary") {
    // the frame-sampling fast path must agree with the full decode on
    // container framing, or a skipped frame would desynchronize every
    // frame index after it
    val frames = (0 until 5).map(f => Png.encodeGray(2, 2, pixels(4, f), f % 2 == 0))
    val container = frames.reduce(_ ++ _)
    var off = 0
    (0 until 5).foreach { f =>
      val (_, next) = Png.decodeAt(container, off)
      assert(Png.skipAt(container, off) == next, s"frame $f boundary")
      off = next
    }
    assert(off == container.length)
    // structural errors still surface without a decode
    intercept[Png.PngError](Png.skipAt(container, 3))
    intercept[Png.PngError](Png.skipAt(container.take(20), 0))
  }
}
