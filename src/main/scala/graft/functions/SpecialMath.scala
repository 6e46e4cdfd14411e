package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Log-gamma as a PORTABLE column formula — the Lanczos approximation
  * (g = 7, 9 coefficients; |rel ε| < 1e-13 for x ≥ 0.5), written as the
  * SAME left-associated IEEE operation sequence in the Spark Column DSL
  * and in generated SQL text, so both engines evaluate bit-for-bit
  * modulo the one libm `ln`/`exp` call — the [[Portable.r6]]-pinned
  * tolerance every cross-engine double here already lives under
  * (cf. [[graft.operators.Hypothesis.pFromZ]]).
  *
  * Exists for the EXACT tests (Fisher) whose hypergeometric terms need
  * log-factorials of corpus-scale counts: enumerating Σ ln k per term
  * would be O(terms·n), and neither engine exposes `lgamma` in SQL.
  * Only x ≥ 1 is needed (factorials), so no reflection branch.
  */
object SpecialMath {

  /** Lanczos g=7 coefficients (Boost/GSL's classic set). */
  private val C = Seq(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** 0.5·ln(2π) as the fixed JVM double, mirrored literally in SQL. */
  private val HalfLn2Pi = 0.9189385332046727

  /** lgamma(x) for x ≥ 1 (callers pass counts + 1). */
  def lgamma(x: Column): Column = {
    val a = C.zipWithIndex.tail.foldLeft(lit(C.head): Column) {
      case (acc, (ci, i)) => acc + lit(ci) / (x + lit((i - 1).toDouble))
    }
    val t = x + lit(6.5)
    lit(HalfLn2Pi) + (x - lit(0.5)) * log(t) - t + log(a)
  }

  /** ln(n!) = lgamma(n + 1); `n` any non-negative numeric column. */
  def lfact(n: Column): Column = lgamma(n.cast("double") + lit(1.0))

  /** The identical formula as SQL text (DuckDB), same operation order. */
  def lgammaSql(x: String): String = {
    val a = C.zipWithIndex.tail.foldLeft(C.head.toString) {
      case (acc, (ci, i)) => s"$acc + ($ci) / (($x) + ${(i - 1).toDouble})"
    }
    s"($HalfLn2Pi + (($x) - 0.5) * ln(($x) + 6.5) - (($x) + 6.5) + ln($a))"
  }

  def lfactSql(n: String): String = lgammaSql(s"CAST($n AS DOUBLE) + 1.0")
}
