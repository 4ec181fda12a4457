package graft.functions

/** Helpers for logic that must be bit-identical in Spark and DuckDB.
  *
  * Anything feeding a correctness oracle can only use functions both
  * engines share (md5, ascii, substr, integer arithmetic) — engine-local
  * hashes (xxhash64, DuckDB hash()) are allowed only on candidate-
  * generation paths whose final output is re-verified with portable
  * exact predicates (SURVEY.md §4).
  */
object Portable {

  /** Parse `nHex` hex chars of `expr` starting at 1-based `start` into a
    * BIGINT — the DuckDB-side equivalent of Spark's conv(x, 16, 10).
    * Unrolled positional arithmetic; exact for nHex <= 15 (60 bits).
    */
  def hexToLongSql(expr: String, start: Int, nHex: Int): String = {
    require(nHex <= 15)
    (0 until nHex).map { i =>
      val weight = math.pow(16.0, (nHex - 1 - i).toDouble).toLong
      s"(strpos('0123456789abcdef', substr($expr, ${start + i}, 1)) - 1) * ${weight}"
    }.mkString("(", " + ", ")")
  }

  /** Spark-side: conv handles the same parse natively. */
  def hexToLongSpark(expr: String, start: Int, nHex: Int): String =
    s"CAST(conv(substr($expr, $start, $nHex), 16, 10) AS BIGINT)"

  /** Fingerprint modulus and 31^i mod P powers (P = 1e9+7). */
  val FpMod = 1000000007L
  val Pow31: IndexedSeq[Long] = {
    val b = IndexedSeq.newBuilder[Long]
    var p = 1L
    (0 until 64).foreach { _ => b += p; p = p * 31 % FpMod }
    b.result()
  }

  /** 60-bit token hash from md5 — identical in both engines. */
  def tokenHashSpark(wordExpr: String): String =
    hexToLongSpark(s"md5($wordExpr)", 1, 15)
  def tokenHashSql(wordExpr: String): String =
    hexToLongSql(s"md5($wordExpr)", 1, 15)
}
