package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation over an event stream — "how long
  * until a user converts/churns, accounting for users we stopped
  * observing" (right censoring). The per-key duration starts at the
  * key's FIRST event; the terminal event is its first `eventType`
  * occurrence (observed) or its last event of any type (censored).
  *
  * Output is the day-granularity KM curve: one row per distinct
  * duration with the risk set, event/censor counts, and the cumulative
  * log-survival. `log_s(t) = Σ_{t'≤t, d>0} r6(ln(1 − d/n_risk))` and
  * S(t) = e^{log_s}; the LOG curve is emitted because it is exactly the
  * windowed sum of per-row hazard terms — each term r6-rounded before a
  * DECIMAL(38,6) cumulative sum, so the curve is bit-portable across
  * engines (the same ln-sum discipline as the LM/KL scores; an exp at
  * the end would add nothing but another libm call).
  *
  * Spark shape: ONE shuffle on the key builds per-key spans; the curve
  * frame is DAY-granularity — bounded by the observation horizon (days,
  * not keys or rows), so the two cumulative windows over it are global
  * windows over a provably tiny frame (the same bounded-by-contract
  * class as the vocabulary rank in fit_vocabulary_indices), sharing one
  * sort. The at-risk count comes from total − running(prior d+c) with
  * the one-row total broadcast — no triangular self-join.
  *
  * Reference analog: none (time-to-event analytics extension per the
  * build brief; complements [[Retention]] / [[Funnel]]).
  */
object Survival {

  private val DayUs = 86400000000L

  /** (t_day, n_risk, d_events, c_censored, log_s). `t_day` is whole
    * days from the key's first event; keys whose first event IS the
    * terminal event land at day 0. Keys with no event at all after
    * filtering NULL times are absent.
    */
  def kaplanMeier(
      events: DataFrame,
      keyCol: String,
      timeCol: String,
      typeCol: String,
      eventType: String): DataFrame = {
    val t = unix_micros(col(timeCol))
    // one key shuffle: first event, first terminal event, last event
    val spans = events
      .filter(col(timeCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(
        min(t).as("__t0"),
        min(when(col(typeCol) === eventType, t)).as("__te"),
        max(t).as("__tl"))
    val durations = spans.select(
      floor((coalesce(col("__te"), col("__tl")) - col("__t0")).cast("double") / DayUs.toDouble)
        .cast("long").as("t_day"),
      col("__te").isNotNull.as("__observed"))
    // day-granularity curve: bounded by the horizon, not the corpus
    val curve = durations
      .groupBy(col("t_day"))
      .agg(
        count(when(col("__observed"), lit(1))).as("d_events"),
        count(when(!col("__observed"), lit(1))).as("c_censored"))
    val total = curve.agg(
      sum(col("d_events") + col("c_censored")).as("__total"))
    val byT = Window.orderBy(col("t_day"))
    val prior = byT.rowsBetween(Window.unboundedPreceding, -1)
    val withRisk = curve
      .crossJoin(broadcast(total)) // one-row totals frame: lint-exempt
      .withColumn("n_risk",
        col("__total") - coalesce(
          sum(col("d_events") + col("c_censored")).over(prior), lit(0L)))
    // hazard term per day, r6-rounded BEFORE the DECIMAL cumulative sum.
    // d == n_risk (survival hits exactly zero, ln(0) = −∞) can only occur
    // on the TERMINAL day (no one outlives it); that row emits NULL log_s
    // instead of an unportable infinity, and no later row exists to
    // inherit the skip.
    val term = when(col("d_events") > 0 && col("d_events") < col("n_risk"),
      graft.functions.Portable.r6(
        log(lit(1.0) - col("d_events").cast("double") / col("n_risk").cast("double"))))
      .otherwise(lit(0.0))
    withRisk
      .withColumn("log_s",
        when(col("d_events") === col("n_risk"), lit(null).cast("double"))
          .otherwise(sum(term.cast("decimal(38,6)")).over(byT).cast("double")))
      .select(col("t_day"), col("n_risk"), col("d_events"), col("c_censored"), col("log_s"))
  }
}
