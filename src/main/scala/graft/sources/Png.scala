package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{Adler32, CRC32, DataFormatException, Deflater, Inflater}

/** Pure-JVM PNG codec (encode + decode), backing the `mm_*` multimodal
  * operators with a REAL container format instead of a header-parse
  * stub: real signature/chunk/CRC framing, real zlib (Inflater), real
  * per-scanline defiltering per the PNG spec (RFC 2083 §6).
  *
  * Scope — what a training-data decode stage needs, nothing more:
  *  - bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  *    6 (RGBA); no palette, no 1/2/4/16-bit, no interlace (each
  *    rejected with a clear [[PngError]], mirroring GeoTiff.scala's
  *    explicit-unsupported style).
  *  - all five filter types (None/Sub/Up/Average/Paeth) on decode;
  *    the encoder cycles filters row-by-row so every decode path is
  *    exercised by round-trip data, and offers a `stored` zlib mode
  *    (hand-rolled stored deflate blocks + Adler-32) whose output
  *    length is closed-form — that is what lets the DuckDB oracle
  *    predict `n_bytes` of a payload without running zlib.
  *  - multi-image "video" containers as plain PNG concatenation,
  *    split by walking each stream's chunk framing to its IEND.
  */
object Png {

  final case class PngError(msg: String) extends RuntimeException(msg)

  /** Decoded image: `pixels` is the defiltered scanline data, row-major,
    * `bpp` (= samples per pixel at depth 8) bytes per pixel. */
  final case class Image(width: Int, height: Int, colorType: Int,
      pixels: Array[Byte]) {
    def bpp: Int = bppOf(colorType)
    def px(y: Int, x: Int, sample: Int = 0): Int =
      pixels((y * width + x) * bpp + sample) & 0xff
  }

  val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Samples per pixel for the supported (8-bit) color types. */
  def bppOf(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 4 => 2
    case 6 => 4
    case other => throw PngError(s"unsupported color type $other " +
      "(palette and other exotic types are out of scope)")
  }

  // ---------------------------------------------------------------- encode

  /** Encode 8-bit pixels (row-major, bppOf(colorType) bytes/pixel).
    *
    * `stored = true` emits hand-rolled stored-mode zlib (deterministic,
    * closed-form length: 2 + 5*ceil(n/65535) + n + 4 for n filtered
    * bytes); `stored = false` uses Deflater (real compression, length
    * implementation-defined — fine everywhere except oracle-predicted
    * payloads).
    */
  def encode(width: Int, height: Int, colorType: Int, pixels: Array[Byte],
      stored: Boolean = false): Array[Byte] = {
    val bpp = bppOf(colorType)
    require(pixels.length == width * height * bpp,
      s"pixels ${pixels.length} != $width*$height*$bpp")
    val rowBytes = width * bpp
    // Filter each scanline; cycle the five filter types so decoders see
    // (and tests cover) every defilter path. All filters are lossless.
    val filtered = new Array[Byte](height * (1 + rowBytes))
    var y = 0
    while (y < height) {
      val ft = y % 5
      filtered(y * (1 + rowBytes)) = ft.toByte
      var i = 0
      while (i < rowBytes) {
        val raw = pixels(y * rowBytes + i) & 0xff
        val a = if (i >= bpp) pixels(y * rowBytes + i - bpp) & 0xff else 0
        val b = if (y > 0) pixels((y - 1) * rowBytes + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) pixels((y - 1) * rowBytes + i - bpp) & 0xff else 0
        val enc = ft match {
          case 0 => raw
          case 1 => raw - a
          case 2 => raw - b
          case 3 => raw - (a + b) / 2
          case 4 => raw - paeth(a, b, c)
        }
        filtered(y * (1 + rowBytes) + 1 + i) = enc.toByte
        i += 1
      }
      y += 1
    }
    val idat = if (stored) zlibStored(filtered) else zlibDeflate(filtered)
    val ihdr = new Array[Byte](13)
    putInt(ihdr, 0, width)
    putInt(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    ihdr(10) = 0 // compression: deflate
    ihdr(11) = 0 // filter method: adaptive
    ihdr(12) = 0 // interlace: none
    val out = new ByteArrayOutputStream(64 + idat.length)
    out.write(Signature, 0, Signature.length)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", idat)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  def encodeGray(width: Int, height: Int, pixels: Array[Byte],
      stored: Boolean = false): Array[Byte] =
    encode(width, height, 0, pixels, stored)

  /** Encoded size of a stored-mode grayscale PNG — the closed form the
    * DuckDB oracle uses for `n_bytes` (signature 8 + IHDR 25 + IDAT
    * 12+zlib + IEND 12). */
  def storedGraySize(width: Int, height: Int): Int = {
    val n = height * (1 + width) // filtered bytes, bpp=1
    val zlib = 2 + 5 * ((n + 65534) / 65535) + n + 4
    8 + 25 + (12 + zlib) + 12
  }

  private def zlibDeflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Hand-rolled zlib stream of stored (BTYPE=00) deflate blocks:
    * CMF/FLG 0x78 0x01, per-block [final, len, ~len, bytes], Adler-32.
    * Byte-deterministic, so payload lengths are oracle-predictable. */
  private def zlibStored(data: Array[Byte]): Array[Byte] = {
    val nBlocks = math.max(1, (data.length + 65534) / 65535)
    val out = new ByteArrayOutputStream(2 + 5 * nBlocks + data.length + 4)
    out.write(0x78); out.write(0x01)
    var off = 0
    var block = 0
    while (block < nBlocks) {
      val len = math.min(65535, data.length - off)
      out.write(if (block == nBlocks - 1) 1 else 0) // BFINAL + BTYPE=00
      out.write(len & 0xff); out.write((len >> 8) & 0xff)
      out.write(~len & 0xff); out.write((~len >> 8) & 0xff)
      out.write(data, off, len)
      off += len
      block += 1
    }
    val ad = new Adler32(); ad.update(data)
    val a = ad.getValue
    out.write(((a >> 24) & 0xff).toInt); out.write(((a >> 16) & 0xff).toInt)
    out.write(((a >> 8) & 0xff).toInt); out.write((a & 0xff).toInt)
    out.toByteArray
  }

  private def writeChunk(out: ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putInt(len, 0, data.length)
    out.write(len, 0, 4)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32(); crc.update(t); crc.update(data)
    val c = new Array[Byte](4); putInt(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  private def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  // ---------------------------------------------------------------- decode

  /** Decode one PNG starting at `off`; returns the image and the offset
    * just past its IEND chunk (enabling concatenated-frame containers).
    */
  def decodeAt(bytes: Array[Byte], off: Int): (Image, Int) = {
    if (off + 8 > bytes.length ||
        !java.util.Arrays.equals(bytes, off, off + 8, Signature, 0, 8))
      throw PngError(s"bad PNG signature at offset $off")
    var p = off + 8
    var width = -1; var height = -1; var colorType = -1
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done) {
      if (p + 8 > bytes.length) throw PngError("truncated chunk header")
      val len = getInt(bytes, p)
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      // Long arithmetic: a crafted len near Int.MaxValue would wrap
      // the Int sum negative and sneak past the bound check
      if (len < 0 || p.toLong + 12L + len > bytes.length)
        throw PngError(s"truncated $typ chunk (len=$len)")
      val crc = new CRC32(); crc.update(bytes, p + 4, 4 + len)
      if (crc.getValue.toInt != getInt(bytes, p + 8 + len))
        throw PngError(s"CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          if (len != 13) throw PngError(s"IHDR length $len != 13")
          width = getInt(bytes, p + 8)
          height = getInt(bytes, p + 12)
          val bitDepth = bytes(p + 16) & 0xff
          colorType = bytes(p + 17) & 0xff
          val interlace = bytes(p + 20) & 0xff
          if (bitDepth != 8)
            throw PngError(s"unsupported bit depth $bitDepth (8 expected)")
          bppOf(colorType) // validates color type
          if ((bytes(p + 18) & 0xff) != 0) throw PngError("bad compression method")
          if ((bytes(p + 19) & 0xff) != 0) throw PngError("bad filter method")
          if (interlace != 0)
            throw PngError("Adam7 interlace is not supported")
          if (width <= 0 || height <= 0)
            throw PngError(s"bad dimensions ${width}x$height")
        case "IDAT" => idat.write(bytes, p + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      p += 12 + len
    }
    if (width < 0) throw PngError("missing IHDR")
    val bpp = bppOf(colorType)
    val rowBytes = width * bpp
    val filtered = inflate(idat.toByteArray, height * (1 + rowBytes))
    val pixels = new Array[Byte](height * rowBytes)
    var y = 0
    while (y < height) {
      val ft = filtered(y * (1 + rowBytes)) & 0xff
      if (ft > 4) throw PngError(s"bad filter type $ft on row $y")
      var i = 0
      while (i < rowBytes) {
        val enc = filtered(y * (1 + rowBytes) + 1 + i) & 0xff
        val a = if (i >= bpp) pixels(y * rowBytes + i - bpp) & 0xff else 0
        val b = if (y > 0) pixels((y - 1) * rowBytes + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) pixels((y - 1) * rowBytes + i - bpp) & 0xff else 0
        val raw = ft match {
          case 0 => enc
          case 1 => enc + a
          case 2 => enc + b
          case 3 => enc + (a + b) / 2
          case 4 => enc + paeth(a, b, c)
        }
        pixels(y * rowBytes + i) = raw.toByte
        i += 1
      }
      y += 1
    }
    (Image(width, height, colorType, pixels), p)
  }

  def decode(bytes: Array[Byte]): Image = {
    val (img, end) = decodeAt(bytes, 0)
    if (end != bytes.length)
      throw PngError(s"trailing ${bytes.length - end} bytes after IEND " +
        "(concatenated frames? use decodeFrames)")
    img
  }

  /** Split + decode a concatenated-PNG "video" container. */
  /** Advance past one PNG starting at `off` WITHOUT decoding it: a
    * signature check plus a chunk-length walk to IEND. The
    * frame-sampling fast path (r16 verdict item 7): a container's
    * non-sampled frames pay a ~per-chunk pointer walk instead of
    * inflate + defilter + pixel copy. Structural bounds are still
    * validated (bad lengths fail loudly); CRCs and pixel data are not
    * touched — the sampled frames' full decode keeps the container
    * honest, and a skipped frame's corruption surfaces the moment any
    * consumer decodes it. */
  def skipAt(bytes: Array[Byte], off: Int): Int = {
    if (off + 8 > bytes.length ||
        !java.util.Arrays.equals(bytes, off, off + 8, Signature, 0, 8))
      throw PngError(s"bad PNG signature at offset $off")
    var p = off + 8
    var done = false
    while (!done) {
      if (p + 8 > bytes.length) throw PngError("truncated chunk header")
      val len = getInt(bytes, p)
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      // Long arithmetic: a crafted len near Int.MaxValue would wrap
      // the Int sum negative and sneak past the bound check
      if (len < 0 || p.toLong + 12L + len > bytes.length)
        throw PngError(s"truncated $typ chunk (len=$len)")
      done = typ == "IEND"
      p += 12 + len
    }
    p
  }

  def decodeFrames(container: Array[Byte]): Vector[Image] = {
    val out = Vector.newBuilder[Image]
    var off = 0
    while (off < container.length) {
      val (img, next) = decodeAt(container, off)
      out += img
      off = next
    }
    out.result()
  }

  private def inflate(zdata: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(zdata)
    val out = new Array[Byte](expected)
    try {
      var got = 0
      while (got < expected && !inf.finished()) {
        val n = inf.inflate(out, got, expected - got)
        if (n == 0 && inf.needsInput())
          throw PngError("truncated IDAT zlib stream")
        got += n
      }
      if (got != expected)
        throw PngError(s"IDAT inflated to $got bytes, expected $expected")
      out
    } catch {
      case e: DataFormatException => throw PngError(s"corrupt IDAT: ${e.getMessage}")
    } finally inf.end()
  }

  /** Paeth predictor, RFC 2083 §6.6. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def getInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
}
