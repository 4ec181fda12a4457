package graft.sources

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** Codec-level coverage for the pure-JVM WAV implementation backing the
  * mm_audio_* operators: lossless PCM round trips at both depths, the
  * closed-form size the oracle predicts, a hand-assembled fixture built
  * WITHOUT the encoder (ancillary chunks, odd-length padding — decode is
  * checked against the RIFF spec, not against our own writer), and the
  * error surface.
  */
class WavSpec extends AnyFunSuite {

  private def samples(n: Int, seed: Int): Array[Short] =
    Array.tabulate(n)(i => ((i * 5881 + seed * 131 + i * i % 977) % 65536 - 32768).toShort)

  test("16-bit mono/stereo round trips, including odd frame counts") {
    for ((n, ch) <- Seq((1, 1), (24, 1), (7, 1), (8, 2), (30, 3))) {
      val s = samples(n * ch, n + ch)
      val a = Wav.decode(Wav.encode(44100, ch, s))
      assert(a.sampleRate == 44100 && a.channels == ch && a.bitsPerSample == 16)
      assert(a.nFrames == n)
      assert(a.samples.toSeq == s.toSeq, s"n=$n ch=$ch")
    }
  }

  test("8-bit round trip recenters to signed and pads odd payloads") {
    val s = Array.tabulate(7)(i => (i * 37 % 256 - 128).toShort)
    val enc = Wav.encode(8000, 1, s, bitsPerSample = 8)
    assert(enc.length % 2 == 0, "odd 8-bit data chunk must be padded")
    val a = Wav.decode(enc)
    assert(a.bitsPerSample == 8 && a.samples.toSeq == s.toSeq)
  }

  test("16-bit payload length matches the closed form the oracle uses") {
    for (n <- Seq(1, 24, 100, 65535)) {
      val enc = Wav.encode(16000, 1, samples(n, n))
      assert(enc.length == Wav.pcm16Size(n), s"n=$n")
    }
  }

  test("boundary sample values survive the round trip") {
    val s = Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1, 255, -256)
    assert(Wav.decode(Wav.encode(1, 1, s)).samples.toSeq == s.toSeq)
  }

  // -- hand-assembled fixture: decode must follow RIFF, not our encoder --

  private def tag(out: ByteArrayOutputStream, t: String): Unit =
    out.write(t.getBytes("US-ASCII"), 0, 4)
  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  /** A WAV a real recorder could emit: LIST-INFO (odd payload → pad
    * byte) and fact chunks around fmt/data, 2ch 16-bit PCM. */
  private def handAssembled(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    tag(out, "RIFF"); le32(out, 0); tag(out, "WAVE") // size patched below
    tag(out, "LIST"); le32(out, 5)
    out.write("INFOx".getBytes("US-ASCII")); out.write(0) // odd → pad
    tag(out, "fmt "); le32(out, 16)
    le16(out, 1); le16(out, 2); le32(out, 22050)
    le32(out, 22050 * 4); le16(out, 4); le16(out, 16)
    tag(out, "fact"); le32(out, 4); le32(out, 3)
    tag(out, "data"); le32(out, 12)
    for (v <- Seq(100, -100, 2000, -32768, 32767, 0)) le16(out, v & 0xffff)
    val b = out.toByteArray
    val size = b.length - 8
    b(4) = (size & 0xff).toByte; b(5) = ((size >> 8) & 0xff).toByte
    b(6) = ((size >> 16) & 0xff).toByte; b(7) = ((size >> 24) & 0xff).toByte
    b
  }

  test("hand-assembled fixture with ancillary chunks and pad bytes decodes") {
    val a = Wav.decode(handAssembled())
    assert(a.sampleRate == 22050 && a.channels == 2 && a.bitsPerSample == 16)
    assert(a.nFrames == 3)
    assert(a.samples.toSeq == Seq[Short](100, -100, 2000, -32768, 32767, 0))
  }

  // ------------------------------------------------------ error surface

  private def expectErr(bytes: Array[Byte], needle: String): Unit = {
    val e = intercept[Wav.WavError](Wav.decode(bytes))
    assert(e.msg.contains(needle), s"'${e.msg}' !contains '$needle'")
  }

  test("error surface: magic, sizes, format tag, field consistency") {
    val good = Wav.encode(16000, 1, samples(24, 1))
    expectErr("JUNK".getBytes ++ good.drop(4), "bad RIFF magic")
    expectErr(good.dropRight(1), "RIFF size")
    expectErr(good.take(40), "RIFF size") // truncated mid-chunk
    val notWave = good.clone(); notWave(8) = 'X'.toByte
    expectErr(notWave, "not a WAVE form")

    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // format tag 2 (ADPCM) at offset 20
    expectErr(patched(b => b(20) = 2), "format tag 2")
    // bits 12 at offset 34
    expectErr(patched(b => b(34) = 12), "bit depth 12")
    // blockAlign 3 at offset 32
    expectErr(patched(b => b(32) = 3), "blockAlign 3")
    // byteRate off by one at offset 28
    expectErr(patched(b => b(28) = (b(28) + 1).toByte), "byteRate")
  }

  test("error surface: chunk-level problems") {
    // data before fmt: swap the two chunks of a canonical stream
    val good = Wav.encode(16000, 1, samples(4, 2))
    val out = new ByteArrayOutputStream()
    out.write(good, 0, 12)
    out.write(good, 36, good.length - 36) // data chunk (8 + 8 bytes)
    out.write(good, 12, 24) // fmt chunk
    val swapped = out.toByteArray
    val e = intercept[Wav.WavError](Wav.decode(swapped))
    assert(e.msg.contains("data chunk before fmt"))

    // data length not a multiple of the frame size: shrink the declared
    // data len (offset 40 in the canonical header) without truncating
    // the stream, so the RIFF-size check still passes
    val stereo = Wav.encode(8000, 2, samples(4, 3))
    val bad = stereo.clone()
    bad(40) = 6 // 6 bytes is not a multiple of blockAlign 4
    val e2 = intercept[Wav.WavError](Wav.decode(bad))
    assert(e2.msg.contains("not a multiple"))

    expectErr(Array[Byte](1, 2, 3), "truncated RIFF header")
  }

  // -------------------------------------- mm_audio_* operator arithmetic

  test("audio metadata/DSP on a known signal (square wave)") {
    import graft.pipeline.Multimodal
    // alternate ±1000 → every adjacent product is negative: 7 sign flips
    // per 8-sample window, RMS exactly 1000, peak 1000
    val s = Array.tabulate(24)(i => (if (i % 2 == 0) 1000 else -1000).toShort)
    val a = Multimodal.Asset(9L, Wav.encode(Multimodal.AudioRate, 1, s))
    assert(Multimodal.decodeAudioMeta(a) ==
      Multimodal.AudioMeta(9L, Wav.pcm16Size(24), 16000, 1, 16, 24, 0L))
    val wins = Multimodal.decodeAudioWindows(a)
    assert(wins.map(_.win) == Seq(0L, 1L, 2L))
    wins.foreach { w =>
      assert(w.rms_raw == 1000.0 && w.zero_cross == 7L && w.peak == 1000L)
    }
    val pts = Multimodal.decodeAudioResample(a)
    assert(pts.size == 12 && pts.forall(_.avg_s == 0.0)) // pairs cancel
  }

  test("zero-cross is a strict sign flip (zeros break a crossing)") {
    import graft.pipeline.Multimodal
    val s: Array[Short] =
      Array[Short](5, 0, -5, 5, -5, 0, 0, 3) ++ Array.fill[Short](16)(1)
    val wins = Multimodal.decodeAudioWindows(
      Multimodal.Asset(1L, Wav.encode(16000, 1, s)))
    // window 0 pairs: (5,0) (0,-5) (-5,5) (5,-5) (-5,0) (0,0) (0,3) —
    // only the two strict flips count; zero-touching pairs do not
    assert(wins.head.zero_cross == 2L)
    assert(wins(1).zero_cross == 0L && wins(2).zero_cross == 0L)
  }

  test("missing fmt / missing data are named errors") {
    val out = new ByteArrayOutputStream()
    tag(out, "RIFF"); le32(out, 4); tag(out, "WAVE")
    expectErr(out.toByteArray, "missing fmt")

    val out2 = new ByteArrayOutputStream()
    tag(out2, "RIFF"); le32(out2, 4 + 24); tag(out2, "WAVE")
    tag(out2, "fmt "); le32(out2, 16)
    le16(out2, 1); le16(out2, 1); le32(out2, 8000)
    le32(out2, 16000); le16(out2, 2); le16(out2, 16)
    expectErr(out2.toByteArray, "missing data")
  }
}
