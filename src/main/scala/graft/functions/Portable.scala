package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-portable numeric helpers for oracle-compared outputs. */
object Portable {

  /** Round to 6 decimals the PORTABLE way: `floor(x·10⁶ + 0.5) / 10⁶`,
    * the same IEEE operation sequence in every engine, so two engines
    * holding the SAME double always emit the same rounded value.
    *
    * Why not `round(x, 6)`: Spark rounds the double's full decimal
    * expansion (BigDecimal HALF_UP) while DuckDB rounds the scaled
    * double — on boundary values like 0.7585055 whose binary form sits
    * a hair off the decimal .5, the two disagree by one ulp of the
    * sixth decimal. That is a 1-in-millions flake per emitted value:
    * invisible at sf0.01, a guaranteed eventual mismatch at scale.
    *
    * NaN passes through (Spark's floor would mangle it to 0 via the
    * long cast); NULL propagates naturally. Magnitudes must stay below
    * 2⁵³/10⁶ for the long↔double trip to be exact — true for every
    * ratio, cosine, z-score and day-delta this library emits.
    */
  def r6(c: Column): Column =
    when(isnan(c), c).otherwise(floor(c * 1000000.0 + 0.5) / 1000000.0)

  /** The DuckDB rendering of [[r6]] — keep the two in lockstep. */
  def r6Sql(e: String): String = s"floor(($e) * 1000000 + 0.5) / 1000000"
}
