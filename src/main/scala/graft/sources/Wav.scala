package graft.sources

import java.io.ByteArrayOutputStream

/** Pure-JVM WAV (RIFF/PCM) codec, backing the `mm_audio_*` multimodal
  * operators with a REAL audio container format: real RIFF framing
  * (chunk ids, little-endian sizes, word alignment), a validated PCM
  * `fmt ` chunk, and sample reconstruction from the `data` payload —
  * the audio sibling of [[Png]].
  *
  * Scope — what a training-data audio-decode stage needs, nothing more:
  *  - PCM only (format tag 1), 8-bit unsigned or 16-bit signed
  *    little-endian, any channel count; compressed formats (µ-law,
  *    ADPCM, float, extensible) are rejected with a clear [[WavError]].
  *  - chunk walk tolerates any chunk order and skips ancillary chunks
  *    (LIST/INFO, fact, cue) with RIFF's odd-length pad rule, so real
  *    recorder output parses; `fmt ` must precede `data` (spec rule).
  *  - canonical 44-byte-header encode whose total length is closed-form
  *    (`pcm16Size`) — what lets the DuckDB oracle predict `n_bytes` of
  *    a payload without running the codec.
  */
object Wav {

  final case class WavError(msg: String) extends RuntimeException(msg)

  /** Decoded audio: interleaved samples, one Short per sample point.
    * 8-bit input (unsigned, 0..255) is centered to signed -128..127 so
    * downstream DSP (RMS, zero-cross) is depth-independent. */
  final case class Audio(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Short]) {
    def nFrames: Int = samples.length / channels
  }

  // ---------------------------------------------------------------- encode

  /** Canonical RIFF/WAVE encode: 12-byte RIFF header, 16-byte PCM
    * `fmt ` chunk, `data` chunk (16-bit signed LE or 8-bit unsigned),
    * odd 8-bit payloads padded per RIFF. Deterministic byte-for-byte. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short],
      bitsPerSample: Int = 16): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    require(bitsPerSample == 8 || bitsPerSample == 16,
      s"unsupported encode depth $bitsPerSample")
    val bytesPerSample = bitsPerSample / 8
    val dataLen = samples.length * bytesPerSample
    val pad = dataLen % 2 // RIFF word alignment for odd 8-bit payloads
    val riffLen = 4 + (8 + 16) + (8 + dataLen + pad)
    val out = new ByteArrayOutputStream(8 + riffLen)
    writeTag(out, "RIFF"); writeIntLE(out, riffLen); writeTag(out, "WAVE")
    writeTag(out, "fmt "); writeIntLE(out, 16)
    writeShortLE(out, 1) // PCM
    writeShortLE(out, channels)
    writeIntLE(out, sampleRate)
    val blockAlign = channels * bytesPerSample
    writeIntLE(out, sampleRate * blockAlign) // byte rate
    writeShortLE(out, blockAlign)
    writeShortLE(out, bitsPerSample)
    writeTag(out, "data"); writeIntLE(out, dataLen)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      if (bitsPerSample == 16) { out.write(s & 0xff); out.write((s >> 8) & 0xff) }
      else {
        require(s >= -128 && s <= 127, s"sample $s out of 8-bit range")
        out.write((s + 128) & 0xff) // 8-bit WAV stores unsigned
      }
      i += 1
    }
    if (pad == 1) out.write(0)
    out.toByteArray
  }

  /** Total encoded size of a canonical 16-bit PCM WAV — the closed form
    * the DuckDB oracle uses for `n_bytes` (44-byte header + 2n data). */
  def pcm16Size(nSamples: Int): Int = 44 + 2 * nSamples

  // ---------------------------------------------------------------- decode

  /** Parse a RIFF/WAVE stream: validate the RIFF header, walk chunks in
    * any order (skipping ancillary ones with the odd-size pad rule),
    * validate the PCM `fmt ` fields against each other, and reconstruct
    * the interleaved sample array from `data`. */
  def decode(bytes: Array[Byte]): Audio = {
    if (bytes.length < 12) throw WavError("truncated RIFF header")
    if (tag(bytes, 0) != "RIFF") throw WavError("bad RIFF magic")
    val riffLen = intLE(bytes, 4)
    if (riffLen != bytes.length - 8)
      throw WavError(s"RIFF size $riffLen != ${bytes.length - 8} actual")
    if (tag(bytes, 8) != "WAVE") throw WavError("not a WAVE form")

    var p = 12
    var sampleRate = -1; var channels = -1; var bits = -1; var blockAlign = -1
    var haveFmt = false
    var audio: Audio = null
    while (p < bytes.length) {
      if (p + 8 > bytes.length) throw WavError("truncated chunk header")
      val id = tag(bytes, p)
      val len = intLE(bytes, p + 4)
      if (len < 0 || p + 8 + len > bytes.length)
        throw WavError(s"truncated '$id' chunk (len=$len)")
      id match {
        case "fmt " =>
          if (len < 16) throw WavError(s"fmt chunk too short ($len)")
          val fmtTag = shortLE(bytes, p + 8)
          if (fmtTag != 1)
            throw WavError(s"compressed WAV (format tag $fmtTag) is not " +
              "supported — PCM only")
          channels = shortLE(bytes, p + 10)
          sampleRate = intLE(bytes, p + 12)
          val byteRate = intLE(bytes, p + 16)
          blockAlign = shortLE(bytes, p + 20)
          bits = shortLE(bytes, p + 22)
          if (bits != 8 && bits != 16)
            throw WavError(s"unsupported bit depth $bits (8/16 expected)")
          if (channels <= 0) throw WavError(s"bad channel count $channels")
          if (blockAlign != channels * bits / 8)
            throw WavError(s"blockAlign $blockAlign != channels*bytes " +
              s"${channels * bits / 8}")
          if (byteRate != sampleRate * blockAlign)
            throw WavError(s"byteRate $byteRate != rate*blockAlign " +
              s"${sampleRate * blockAlign}")
          haveFmt = true
        case "data" =>
          if (!haveFmt) throw WavError("data chunk before fmt")
          if (len % blockAlign != 0)
            throw WavError(s"data length $len not a multiple of frame " +
              s"size $blockAlign")
          val n = len / (bits / 8)
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) =
              if (bits == 16)
                ((bytes(p + 8 + 2 * i) & 0xff) |
                  (bytes(p + 8 + 2 * i + 1) << 8)).toShort
              else ((bytes(p + 8 + i) & 0xff) - 128).toShort
            i += 1
          }
          audio = Audio(sampleRate, channels, bits, samples)
        case _ => () // ancillary chunk (LIST, fact, cue, ...) skipped
      }
      p += 8 + len + (len % 2) // RIFF pads odd chunks to word boundary
    }
    if (!haveFmt) throw WavError("missing fmt chunk")
    if (audio == null) throw WavError("missing data chunk")
    audio
  }

  // ---------------------------------------------------------------- bytes

  private def writeTag(out: ByteArrayOutputStream, t: String): Unit =
    out.write(t.getBytes("US-ASCII"), 0, 4)

  private def writeIntLE(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  private def writeShortLE(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  private def intLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def shortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
}
