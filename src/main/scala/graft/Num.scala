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
    * for kernels that compute values in Scala code (mapPartitions). */
  def roundEpsJvm(x: Double, n: Int): Double =
    BigDecimal(x + eps(n)).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
}
