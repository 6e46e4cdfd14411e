package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The library-wide quantile path switch — every percentile-fitting
  * operator ([[Outliers.winsorize]], [[Outliers.robustScale]],
  * [[Outliers.madOutliers]], [[Profile.quantileSummary]]) resolves its
  * quantile aggregate here.
  *
  * `exact = true` is `percentile` — R-7 linear interpolation, the same
  * definition as DuckDB's `quantile_cont`, so results are cross-engine
  * verifiable; it holds each group's full sorted value set, fine for
  * vocabulary-sized groups at oracle scale. With
  * `spark.graft.approxQuantiles=true` set on the session, even
  * exact-requesting call sites flip to `percentile_approx` — one cluster
  * conf line switches the whole library to the one-pass mergeable sketch
  * (same pattern as [[graft.plans.Materialize]]'s checkpoint switch), the
  * right path at 100 TB where exact percentiles would spill every group.
  *
  * Sketch error contract (asserted by ApproxQuantileParitySpec): the
  * returned value's RANK is within `n / accuracy` of the target rank, so
  * the approx quantile at p always lies within the exact quantiles at
  * p ± 1.5/accuracy (the 1.5 covers interpolation between neighbors), and
  * any clamp/flag decision differs from the exact path only for rows whose
  * value falls between the two bounds — a ≤ ~4·1.5/accuracy fraction of
  * each group.
  */
object Quantiles {

  /** Session conf key: "true" forces the approx sketch everywhere. */
  val ApproxKey = "spark.graft.approxQuantiles"

  /** Sketch accuracy: rank error ≤ group size / accuracy. */
  val Accuracy = 10000

  /** The effective path for a call site requesting `exact`. */
  def resolveExact(spark: SparkSession, exact: Boolean): Boolean =
    exact && !spark.conf.getOption(ApproxKey).contains("true")

  /** Quantile aggregate over `v` at probe(s) `p` on the resolved path. */
  def q(v: Column, p: Column, exact: Boolean): Column =
    if (exact) percentile(v, p) else percentile_approx(v, p, lit(Accuracy))
}
