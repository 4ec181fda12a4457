package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType}

/** Single-pass hashing kernels for the dedup family.
  *
  * The naive declarative formulations (a 96-column min() aggregate for
  * MinHash, 60 bit-sum aggregates for SimHash) are correct but burn an
  * order of magnitude more CPU than needed: every input row updates a
  * 60-96 field aggregation buffer through codegen'd-but-per-column
  * writes (measured 63 s of executor CPU at sf0.1 for the MinHash agg
  * alone). These expressions instead take the per-document value array
  * (built shuffle-free at ingestion) and compute the whole signature in
  * one tight primitive loop per document — preference order (b) from
  * the build plan: a custom Expression, not a custom physical operator
  * and never a UDF. Both the interpreted eval and the generated code
  * call the same static kernel, so there is exactly one implementation
  * of the arithmetic.
  */
object HashKernels {

  import graft.pipeline.Dedup.{BandRows, MersennePrime, NumBands, NumPerm}

  private val PermA: Array[Long] =
    Array.tabulate(NumPerm)(i => (i * 2654435761L + 12345L) % MersennePrime match {
      case 0L => 1L
      case a => a
    })
  private val PermB: Array[Long] =
    Array.tabulate(NumPerm)(i => (i * 40503L + 7L) % MersennePrime)

  /** MinHash signature (NumPerm mins of a_i·h + b_i mod p) folded into
    * NumBands LSH band keys. Band key = 64-bit mix of the band id and
    * its BandRows mins — engine-local hashing is fine here because band
    * keys never leave the engine (candidates are exact-verified).
    */
  def minhashBands(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val mins = Array.fill(NumPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // reduce below 2^31 once so every product stays under 2^62
      val hp = java.lang.Math.floorMod(hs.getLong(i), MersennePrime)
      var j = 0
      while (j < NumPerm) {
        val v = (hp * PermA(j) + PermB(j)) % MersennePrime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val bands = new Array[Long](NumBands)
    var b = 0
    while (b < NumBands) {
      // 64-bit avalanche fold (splitmix64 finalizer per component)
      var acc = b.toLong
      var r = 0
      while (r < BandRows) {
        var z = acc + mins(b * BandRows + r) + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        acc = z ^ (z >>> 31)
        r += 1
      }
      bands(b) = acc
      b += 1
    }
    new GenericArrayData(bands)
  }

  /** Distinct word-3-gram hashes of a token array, ascending-sorted:
    * the per-document shingle set with each shingle reduced to a 64-bit
    * hash at build time (a within-document collision is ~1e-15 for
    * realistic document sizes). The hash (splitmix64 over an FNV-style
    * byte fold of "w0 w1 w2") is engine-local by design: only
    * intersection COUNTS ever cross to the oracle, never the hashes.
    * Incremental per-word folding — the 3-gram string is never
    * materialized.
    */
  def shingle3SortedHashes(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    // rolling FNV-1a fold of each word's UTF8 bytes, then combine the
    // three word folds + positions through splitmix64
    val wordH = new Array[Long](n)
    var i = 0
    while (i < n) {
      val bytes = ws.getUTF8String(i).getBytes
      var h = 0xcbf29ce484222325L
      var k = 0
      while (k < bytes.length) { h = (h ^ (bytes(k) & 0xffL)) * 0x100000001b3L; k += 1 }
      wordH(i) = h
      i += 1
    }
    val out = new Array[Long](n - 2)
    i = 0
    while (i < n - 2) {
      var z = wordH(i) + 0x9e3779b97f4a7c15L * (wordH(i + 1) + 0x9e3779b97f4a7c15L * wordH(i + 2))
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      out(i) = z ^ (z >>> 31)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var w = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** |a ∩ b| for two ascending-sorted long arrays (linear merge). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Polynomial rolling-hash fingerprint of the first 64 characters:
    * Σ codepoint(c_i)·31^(i-1) mod 1e9+7 — bit-identical to the
    * portable SQL form (ascii(substr(text, i, 1)) over Pow31), but one
    * tight loop instead of a 64-iteration interpreted `aggregate` HOF
    * per row (SURVEY §5 item 1: higher-order functions are evaluated
    * per element, off codegen). */
  def fingerprint31(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    val mod = Portable.FpMod
    var acc = 0L
    var i = 0   // character index (codepoint-aware, like substr/ascii)
    var off = 0 // char offset into the backing String
    while (off < str.length && i < 64) {
      val cp = str.codePointAt(off)
      acc = (acc + cp.toLong * Portable.Pow31(i)) % mod
      off += Character.charCount(cp)
      i += 1
    }
    acc
  }

  /** 60-bit SimHash over a token array, bit-identical to the portable
    * SQL form (Portable.tokenHashSpark/Sql): token hash = first 15 hex
    * chars of md5(token) = top 60 bits of the digest; sign-sum per bit
    * with multiplicity; bit set iff the sum is >= 0.
    */
  // one digest per thread, not per document: getInstance does a JCA
  // provider lookup + allocation, pure overhead on this hot kernel
  // (digest() self-resets, so reuse is safe)
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def simhash60(ws: ArrayData): Long = {
    val md = md5Local.get()
    val counts = new Array[Int](60)
    val n = ws.numElements()
    var i = 0
    while (i < n) {
      val d = md.digest(ws.getUTF8String(i).getBytes)
      // conv(substr(md5,1,15),16,10): 7 full bytes + the high nibble of
      // the 8th
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      h = (h << 4) | ((d(7) >> 4) & 0xfL)
      var bit = 0
      while (bit < 60) {
        counts(bit) += (((h >>> bit) & 1L).toInt * 2) - 1
        bit += 1
      }
      i += 1
    }
    var sim = 0L
    var bit = 0
    while (bit < 60) {
      if (counts(bit) >= 0) sim |= 1L << bit
      bit += 1
    }
    sim
  }

  /** (a, b, c) chunk indices per triple id, in the same
    * (0 until 10).combinations(3) enumeration simhashCanonicalTriple
    * ranks against — the two tables must never drift apart. */
  private val TripleChunks: Array[Int] = {
    val out = new Array[Int](360)
    var t = 0
    (0 until 10).combinations(3).foreach { c =>
      out(3 * t) = c(0); out(3 * t + 1) = c(1); out(3 * t + 2) = c(2)
      t += 1
    }
    out
  }

  /** All 120 chunk-triple posting keys of one 60-bit signature: triple
    * id in bits 18+, the three 6-bit chunk values packed below —
    * bit-identical to the column-arithmetic spelling
    * (t<<18) + (chunk_a<<12) + (chunk_b<<6) + chunk_c.
    *
    * ONE kernel for the same reason as simhashCanonicalTriple: an
    * array() of 120 shift/mask expressions is a ~1300-node tree whose
    * whole-stage-codegen compile alone was measured at ~2 s per fresh
    * session (sf0.1, round 8) — a fixed constant every cold query paid.
    * Here the chunks are extracted once and the 120 keys come from a
    * static index table. */
  def simhashTripleKeys(sim: Long): ArrayData = {
    val ch = new Array[Long](10)
    var i = 0
    while (i < 10) {
      ch(i) = (sim >>> (6 * i)) & 63L
      i += 1
    }
    val out = new Array[Long](120)
    var t = 0
    while (t < 120) {
      out(t) = (t.toLong << 18) + (ch(TripleChunks(3 * t)) << 12) +
        (ch(TripleChunks(3 * t + 1)) << 6) + ch(TripleChunks(3 * t + 2))
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Canonical-emission predicate for the 10×6-bit SimHash chunk-triple
    * LSH (Dedup.simhash): true iff the pair qualifies — hamming(x) ≤ 7
    * for x = sig1 ^ sig2 — AND `t` is the lex rank of the pair's FIRST
    * all-intact chunk triple, i.e. the single posting table allowed to
    * emit it. The constants (10 chunks × 6 bits, 3-subsets, radius 7 =
    * Dedup.HammingRadius) are one inseparable geometry: ≤ 7 flipped
    * bits touch ≤ 7 chunks, leaving ≥ 3 intact, so the lex-first
    * intact triple always exists for a qualifying pair.
    *
    * ONE kernel on purpose: spelled as Catalyst column arithmetic, the
    * alias chain (intact mask → ctz ranks → lex-rank polynomial) is
    * inlined into the pair-join condition during filter pushdown with
    * no common-subexpression elimination — an ~800-node tree evaluated
    * per candidate pair, measured at sf10 to turn the 13 s pair join
    * into a stalled stage. As a static call it is one xor + ~30
    * primitive ops in both codegen and interpreted paths.
    */
  def simhashCanonicalTriple(x: Long, t: Long): Boolean =
    java.lang.Long.bitCount(x) <= 7 && {
      var m = 0
      var i = 0
      while (i < 10) {
        if (((x >>> (6 * i)) & 63L) == 0L) m |= 1 << i
        i += 1
      }
      val i1 = java.lang.Integer.numberOfTrailingZeros(m)
      val m2 = m & (m - 1)
      val i2 = java.lang.Integer.numberOfTrailingZeros(m2)
      val m3 = m2 & (m2 - 1)
      val i3 = java.lang.Integer.numberOfTrailingZeros(m3)
      // lex rank of {i1 < i2 < i3} in the (0 until 10).combinations(3)
      // enumeration: 120 − C(10−i1, 3) + Σ middle gap + tail offset
      t == 120 - (10 - i1) * (9 - i1) * (8 - i1) / 6 +
        (18 - i1 - i2) * (i2 - i1 - 1) / 2 + (i3 - i2 - 1)
    }
}

case class MinHashBands(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes =
    Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"
  override def nullSafeEval(a: Any): Any =
    HashKernels.minhashBands(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashKernels.minhashBands($a);")
  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

case class SimhashTripleKeys(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_triple_keys"
  override def nullSafeEval(a: Any): Any =
    HashKernels.simhashTripleKeys(a.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashKernels.simhashTripleKeys($a);")
  override protected def withNewChildInternal(newChild: Expression): SimhashTripleKeys =
    copy(child = newChild)
}

case class Shingle3SortedHashes(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle3_sorted_hashes"
  override def nullSafeEval(a: Any): Any =
    HashKernels.shingle3SortedHashes(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashKernels.shingle3SortedHashes($a);")
  override protected def withNewChildInternal(newChild: Expression): Shingle3SortedHashes =
    copy(child = newChild)
}

case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashKernels.sortedIntersectCount($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

case class SimhashCanonicalTriple(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes =
    Seq(LongType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "simhash_canonical_triple"
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.simhashCanonicalTriple(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashKernels.simhashCanonicalTriple($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimhashCanonicalTriple =
    copy(left = newLeft, right = newRight)
}

case class Fingerprint31(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes =
    Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint31"
  override def nullSafeEval(a: Any): Any =
    HashKernels.fingerprint31(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashKernels.fingerprint31($a);")
  override protected def withNewChildInternal(newChild: Expression): Fingerprint31 =
    copy(child = newChild)
}

case class SimHash60(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes =
    Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"
  override def nullSafeEval(a: Any): Any =
    HashKernels.simhash60(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashKernels.simhash60($a);")
  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object HashFunctions {
  def minhash_bands(hs: Column): Column =
    ColumnBridge.column(MinHashBands(ColumnBridge.expression(hs)))
  def shingle3_sorted_hashes(ws: Column): Column =
    ColumnBridge.column(Shingle3SortedHashes(ColumnBridge.expression(ws)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
  def simhash60(ws: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(ws)))
  def fingerprint31(s: Column): Column =
    ColumnBridge.column(Fingerprint31(ColumnBridge.expression(s)))
  def simhash_triple_keys(sim: Column): Column =
    ColumnBridge.column(SimhashTripleKeys(ColumnBridge.expression(sim)))
  def simhash_canonical_triple(x: Column, t: Column): Column =
    ColumnBridge.column(SimhashCanonicalTriple(ColumnBridge.expression(x),
      ColumnBridge.expression(t)))
}
