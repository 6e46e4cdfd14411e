package graft

import graft.operators.{Outliers, Profile, Quantiles}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity gates between the exact (R-7 `percentile`) and approx
  * (`percentile_approx` sketch) quantile paths at BENCH scale (sf0.1) —
  * the oracle verifies the exact path; these prove the 100 TB sketch path
  * actually runs and honors the documented error bound
  * ([[graft.operators.Quantiles]]).
  *
  * Bound under test: the sketch's rank error is ≤ n/accuracy per group, so
  * the approx quantile at probe p must lie within the EXACT quantiles at
  * p ± ε where ε = 1.5/accuracy (1.5 covers R-7 interpolation between the
  * bracketing data points), and any clamp/flag decision can differ only
  * for rows whose value falls between the exact and approx bounds — a
  * ≤ ~4ε fraction of each group (two bounds, each displacing ≤ 1.5ε of
  * ranks). The sketch is deterministic given the data, so these are
  * regression gates, not flaky statistical tests.
  */
class ApproxQuantileParitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.1"
  private val Eps = 1.5 / Quantiles.Accuracy

  /** events viewed as MEDS measurements (the q_winsorize input shape). */
  private lazy val meds: DataFrame =
    graft.sources.Tables.events(spark, sf).select(
      col("event_id"),
      col("user_id").cast("long").as("patient_id"),
      col("ts").as("time"),
      col("event_type").as("code"),
      col("value").cast("double").as("numeric_value")
    ).localCheckpoint(true)

  /** Exact quantiles of each code at p-ε, p, p+ε → (code, lo, q, hi). */
  private def exactBracket(p: Double): Map[String, (Double, Double, Double)] = {
    val ps = Seq(math.max(0, p - Eps), p, math.min(1, p + Eps))
    meds.filter(col("numeric_value").isNotNull)
      .groupBy("code")
      .agg(percentile(col("numeric_value"), array(ps.map(lit): _*)).as("qs"))
      .collect()
      .map(r => r.getString(0) -> {
        val qs = r.getSeq[Double](1)
        (qs(0), qs(1), qs(2))
      }).toMap
  }

  private def withApproxConf[T](body: => T): T = {
    spark.conf.set(Quantiles.ApproxKey, "true")
    try body finally spark.conf.unset(Quantiles.ApproxKey)
  }

  test("quantileSummary: approx values sit inside the exact p±eps bracket at sf0.1") {
    val ps = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    val approx = Profile.quantileSummary(meds, Seq("code"), "numeric_value", ps, exact = false)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(approx.nonEmpty)
    ps.foreach { p =>
      val bracket = exactBracket(p)
      bracket.foreach { case (code, (lo, _, hi)) =>
        val got = approx((code, p))
        assert(got >= lo - 1e-9 && got <= hi + 1e-9,
          s"approx q($p) for $code = $got outside exact bracket [$lo, $hi]")
      }
    }
  }

  test("quantileSummary: the session conf forces the sketch even when exact is requested") {
    // the conf-switched plan must be the approx plan: identical output to
    // the explicit exact=false call, and an ApproximatePercentile (not
    // Percentile) aggregate in the optimized plan
    val viaConf = withApproxConf {
      val df = Profile.quantileSummary(meds, Seq("code"), "numeric_value", Seq(0.5), exact = true)
      assert(df.queryExecution.optimizedPlan.toString.contains("percentile_approx"),
        "conf switch did not select the sketch path")
      df.collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    }
    val direct = Profile.quantileSummary(meds, Seq("code"), "numeric_value", Seq(0.5), exact = false)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(viaConf == direct)
  }

  test("winsorize: approx path flips clamp decisions on ≤ ~4*eps of rows, values within bracket width") {
    val in = meds.select(col("event_id"), col("code"), col("numeric_value").as("v_in"))
    def run(ex: Boolean, tag: String) =
      Outliers.winsorize(meds, lowerQ = 0.05, upperQ = 0.95, exact = ex)
        .select(col("event_id"), col("numeric_value").as(tag))
    val joined = in
      .join(run(ex = true, "v_exact"), "event_id")
      .join(run(ex = false, "v_approx"), "event_id")
    val n = joined.count()
    // decision-level bound: a row is clamped in one path and untouched in
    // the other only if v_in falls between the exact and approx bounds —
    // a displaced-rank band of ≤ ~1.5eps per bound, two bounds
    val flips = joined.filter(
      (col("v_exact") === col("v_in")) =!= (col("v_approx") === col("v_in"))).count()
    val flipBound = 4.0 * Eps * n + 10 // +10: integer rank rounding on small groups
    assert(flips <= flipBound, s"clamp decisions differ on $flips of $n rows (bound $flipBound)")
    // value-level bound: whenever both paths clamp, the clamped values can
    // differ by at most the widest exact p±eps bracket (the approx bound
    // lives inside it); rows clamped by neither are bit-identical
    val widths = Seq(0.05, 0.95).flatMap(p => exactBracket(p).values.map { case (lo, _, hi) => hi - lo })
    val maxWidth = widths.max
    val maxDiff = joined
      .select(max(abs(col("v_exact") - col("v_approx"))).as("d"))
      .collect()(0).getDouble(0)
    assert(maxDiff <= maxWidth + 1e-9,
      s"winsorized values diverge by $maxDiff, beyond the exact bracket width $maxWidth")
  }

  test("robustScale: approx scaled values track exact within the displaced-rank bound at sf0.1") {
    val exact = Outliers.robustScale(meds, exact = true)
      .select(col("event_id"), col("scaled_value").as("z_exact"))
    val approx = Outliers.robustScale(meds, exact = false)
      .select(col("event_id"), col("scaled_value").as("z_approx"))
    val joined = exact.join(approx, "event_id")
      .filter(col("z_exact").isNotNull && col("z_approx").isNotNull)
    val n = joined.count()
    assert(n > 0)
    // med/IQR shift by at most the p±eps quantile spread; on this data the
    // resulting |z| drift stays below 2% of the exact z range per code
    val drift = joined
      .select(max(abs(col("z_exact") - col("z_approx"))).as("d"))
      .collect()(0).getDouble(0)
    val zRange = exact.select(
      (max(col("z_exact")) - min(col("z_exact"))).as("r")).collect()(0).getDouble(0)
    assert(drift <= 0.02 * zRange, s"robust_z drift $drift exceeds 2% of range $zRange")
  }

  test("madOutliers: approx flags agree with exact outside the boundary fraction at sf0.1") {
    val ev = graft.sources.Tables.events(spark, sf)
    val exact = Outliers.madOutliers(ev, Seq("event_type"), "value", k = 3.5, exact = true)
      .select(col("event_id"), col("is_outlier").as("f_exact"))
    val approx = Outliers.madOutliers(ev, Seq("event_type"), "value", k = 3.5, exact = false)
      .select(col("event_id"), col("is_outlier").as("f_approx"))
    val joined = exact.join(approx, "event_id")
    val n = joined.count()
    val nDiff = joined.filter(col("f_exact") =!= col("f_approx")).count()
    // two sketched medians (value + |x-med|) → ≤ ~2*1.5eps displaced ranks
    // each; flags flip only inside the displaced band around the k·MAD cut
    val bound = 4.0 * Eps * n + 10
    assert(nDiff <= bound, s"madOutliers flags differ on $nDiff of $n rows (bound $bound)")
  }

  test("quantileShift: approx shifts stay within the doubled bracket at sf0.1") {
    // two sketched quantiles subtract, so the shift can drift by at most
    // the sum of the two sides' bracket widths
    val ev = graft.sources.Tables.events(spark, sf)
    val ps = Seq(0.25, 0.5, 0.75)
    val exact = graft.operators.Stats.quantileShift(
        ev, Seq("event_type"), "value", col("event_id") % 2 === 0, ps, exact = true)
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Double]("p")) -> r).toMap
    val approx = withApproxConf {
      graft.operators.Stats.quantileShift(
          ev, Seq("event_type"), "value", col("event_id") % 2 === 0, ps, exact = true)
        .collect()
    }
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Double]("p"))
      val e = exact(k)
      // per-arm bracket: |q_approx - q_exact| bounded by the local value
      // spread across eps ranks; cheap robust proxy: compare against the
      // exact arm IQR scaled by a generous constant
      val iqrA = math.abs(exact((k._1, 0.75)).getAs[Double]("q_a") -
        exact((k._1, 0.25)).getAs[Double]("q_a"))
      val tol = math.max(1e-6, iqrA * 0.1)
      assert(math.abs(r.getAs[Double]("q_a") - e.getAs[Double]("q_a")) <= tol,
        s"q_a drift at $k")
      assert(math.abs(r.getAs[Double]("shift") - e.getAs[Double]("shift")) <= 2 * tol,
        s"shift drift at $k")
    }
  }
}
