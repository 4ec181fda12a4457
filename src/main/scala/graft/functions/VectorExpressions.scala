package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for dense-vector algebra.
  *
  * Spark's higher-order functions (aggregate/zip_with/transform) are
  * evaluated interpreted, per element, with boxing — unusable on hot
  * paths like ANN scoring. These expressions generate a primitive
  * double loop inside whole-stage codegen (preference order (b) from
  * the build guide: a custom Expression before any custom physical
  * operator, and never a Scala UDF).
  *
  * Summation is in ascending index order, matching the oracle's
  * list_sum semantics (SURVEY.md §4).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // declared input types make a wrong-typed call (the documented
  // mistake: raw array<float> embeddings) an ANALYSIS error instead of
  // silent garbage from reading float bytes as doubles
  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(DoubleType),
      org.apache.spark.sql.types.ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** sqrt(Σ x_i²) with the same codegen shape as DotProduct. */
case class L2Norm(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) { acc += x.getDouble(i) * x.getDouble(i); i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $acc += $a.getDouble($i) * $a.getDouble($i);
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** Int8 scalar-quantization stats: for a vector v, scale = 127 /
  * max|v_i| and the reconstruction MSE of q_i = floor(v_i·scale + 0.5)
  * (floor-based rounding — bit-identical in every engine, unlike
  * round-half-even vs half-away). Returns [scale, mse]; the write-time
  * reduction of an int8-quantized ANN index. One primitive loop via
  * a shared static kernel (eval + codegen, HashKernels pattern). */
object QuantKernel {
  def stats(x: ArrayData): ArrayData = {
    val n = x.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(x.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs == 0.0) 0.0 else 127.0 / maxAbs
    var sse = 0.0
    i = 0
    while (i < n) {
      val v = x.getDouble(i)
      val q = math.floor(v * scale + 0.5)
      val r = if (scale == 0.0) 0.0 else q / scale
      val d = v - r
      sse += d * d
      i += 1
    }
    val mse = if (n == 0) 0.0 else sse / n
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(scale, mse))
  }
}

case class QuantizeStats(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(DoubleType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantize_stats"
  override def nullSafeEval(a: Any): Any =
    QuantKernel.stats(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.QuantKernel.stats($a);")
  override protected def withNewChildInternal(newChild: Expression): QuantizeStats =
    copy(child = newChild)
}

/** Single-pass LSH signature kernel: all `Planes` random-hyperplane
  * sign bits and the packed band keys in ONE loop over the vector —
  * the 64 separate DotProduct expressions it replaces re-read the
  * vector once per plane (64× the memory traffic on the signature
  * pass, and a plan with 64 × 64 embedded literals to codegen). Same
  * single-pass-kernel discipline as the MinHash/SimHash signatures
  * (SURVEY §5 item 5).
  *
  * The ±1 plane matrix is DERIVED, not stored: component (p, i) is +1
  * iff the first hex digit of md5("plane<p>_<i>") is 0–7 — the same
  * strings the DuckDB oracle hashes, so both engines regenerate the
  * identical matrix from nothing. Sign bits use the engine-wide
  * 6-dp eps rounding (Num.roundEpsJvm ≡ Spark round ≡ oracle round)
  * so a dot product within an ulp of zero cannot flip between
  * engines. */
object LshKernel {
  val Planes = 64
  val Bands = 16
  val Rows = 4 // Bands * Rows == Planes
  val Dim = 64

  /** Row-major [p * Dim + i] ±1 matrix. */
  lazy val matrix: Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = new Array[Double](Planes * Dim)
    var p = 0
    while (p < Planes) {
      var i = 0
      while (i < Dim) {
        val h = md.digest(s"plane${p}_$i".getBytes("UTF-8"))
        m(p * Dim + i) = if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
        i += 1
      }
      p += 1
    }
    m
  }

  def bandKeys(x: ArrayData): ArrayData = {
    val keys = new Array[Int](Bands)
    val n = math.min(Dim, x.numElements())
    var p = 0
    while (p < Planes) {
      var dot = 0.0
      var i = 0
      val off = p * Dim
      while (i < n) { dot += x.getDouble(i) * matrix(off + i); i += 1 }
      if (graft.Num.roundEpsJvm(dot, 6) >= 0) keys(p / Rows) |= 1 << (p % Rows)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }
}

case class LshBandKeys(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"
  override def nullSafeEval(a: Any): Any =
    LshKernel.bandKeys(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LshKernel.bandKeys($a);")
  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for the native expressions. Inputs must be
    * array<double> (cast float embeddings first). */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  def l2_norm(a: Column): Column =
    ColumnBridge.column(L2Norm(ColumnBridge.expression(a)))

  def quantize_stats(a: Column): Column =
    ColumnBridge.column(QuantizeStats(ColumnBridge.expression(a)))

  def lsh_band_keys(a: Column): Column =
    ColumnBridge.column(LshBandKeys(ColumnBridge.expression(a)))
}
