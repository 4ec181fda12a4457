package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Cross-engine deterministic rounding.
  *
  * Spark and DuckDB aggregate doubles in different orders, so two
  * correct engines can disagree by 1 ulp (~1e-16 relative). When the
  * true value sits exactly on a round-half boundary — common here,
  * because inputs have 2 decimals, so means are often exact multiples
  * of 1e-7 — that ulp flips `round(x, n)` between engines. Nudging by
  * eps = 10^-(n+3) moves boundary values decisively to one side in both
  * engines (eps is ~1e5× larger than the ulp noise, ~1e3× smaller than
  * the rounding grain), making the rounded output identical.
  */
object Num {
  def eps(n: Int): Double = math.pow(10.0, -(n + 3))

  /** round(c + 10^-(n+3), n) — use for every final double projection. */
  def roundEps(c: Column, n: Int): Column = round(c + lit(eps(n)), n)

  /** The DuckDB-side mirror of roundEps. */
  def roundEpsSql(expr: String, n: Int): String =
    s"round(($expr) + 1e-${n + 3}, $n)"

  /** JVM-side mirror of roundEps (Spark's round = BigDecimal HALF_UP) —
    * for kernels that compute values in Scala code (mapPartitions).
    *
    * Hot-path note: the BigDecimal spelling costs ~1 µs/call, and the
    * rounded-before-argmin kernels (PQ assignment, k-means training,
    * hierarchical routing) make tens of millions of calls — measured
    * 15.7 s of a 2000-vector codebook training run. The fast path
    * below is plain double arithmetic, taken ONLY when the scaled
    * value is provably far from a half-integer boundary: for
    * |y| < 1e4 the computed y·10⁶ carries ≤ ~2e-6 of representation
    * error, so a fractional part ≥ 1e-3 away from 0.5 rounds
    * identically under both spellings (floor+0.5-compare is HALF_UP
    * for the nearest-integer case; k/1e6 is IEEE-exact division of an
    * exact integer). Boundary-adjacent or large values fall back to
    * the exact BigDecimal path, so the function is bit-identical to
    * the old one on every input. Exhaustively cross-checked against
    * the BigDecimal spelling in PropertySpec. */
  def roundEpsJvm(x: Double, n: Int): Double = {
    val y = x + eps(n)
    if (n == 6 && y > -1e4 && y < 1e4) {
      val scaled = y * 1e6
      val fl = math.floor(scaled)
      val frac = scaled - fl
      if (frac > 0.501 || frac < 0.499) {
        (if (frac > 0.5) fl + 1 else fl) / 1e6
      } else roundEpsJvmSlow(x, n)
    } else roundEpsJvmSlow(x, n)
  }

  private[graft] def roundEpsJvmSlow(x: Double, n: Int): Double =
    BigDecimal(x + eps(n)).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
}
