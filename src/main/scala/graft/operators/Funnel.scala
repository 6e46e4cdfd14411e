package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: for each key, walk its event stream in time
  * order and match a fixed sequence of step types, each strictly AFTER
  * the previously matched step ("signup, then a view after the signup,
  * then a purchase after that view"). The product-analytics twin of
  * [[Sessionize]]; the reference has no funnel stage — this is part of
  * the training-data-pipeline surface (conversion labeling, event-
  * sequence cohorting).
  *
  * Shape at scale: the scan is FILTERED to the step types before
  * anything shuffles (funnel steps are a handful of codes; the filter
  * pushes to parquet), then ONE shuffle on the key collects each key's
  * surviving events into a sorted list that a codegen'd `aggregate`
  * HOF folds in a single pass — no joins, no per-step scans, no window.
  * The per-key list is bounded by that key's step-type event count;
  * keys with pathological volumes are a data bug this op surfaces
  * rather than hides (same stance as [[RangeJoin]]'s span cap).
  *
  * Greedy earliest-first matching is exactly the chained-min semantics
  * ("t2 = min t of step2 with t > t1"): both pick the first step-i
  * event after the matched step-(i-1) time, so ties at equal times
  * resolve identically no matter how the list sort breaks them.
  */
object Funnel {

  /** One row per key that completed at least step 1:
    * (key, reached, step_1_us .. step_k_us) — matched times in epoch
    * micros, NULL from the first unmatched step on.
    */
  def funnel(
      events: DataFrame,
      keyCol: String,
      timeCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate step types in $steps")

    val stepArr = array(steps.map(lit): _*)
    val sorted = events
      .filter(col(timeCol).isNotNull && col(typeCol).isin(steps: _*))
      .select(
        col(keyCol).as("key"),
        unix_micros(col(timeCol)).as("t"),
        col(typeCol).as("tp"))
      .groupBy("key")
      .agg(sort_array(collect_list(struct(col("t"), col("tp")))).as("evs"))

    // Fold: state = array of matched step times; an event extends it when
    // it is the next expected type and strictly after the last match.
    // `get` (0-based, NULL past the end — never the ANSI element_at error)
    // makes the full-state and empty-state probes safe without relying on
    // short-circuit evaluation, which codegen doesn't guarantee.
    val matched = aggregate(
      col("evs"),
      array().cast("array<bigint>"),
      (st, e) =>
        when(
          e.getField("tp") === get(stepArr, size(st)) &&
            (size(st) === 0 || e.getField("t") > get(st, size(st) - 1)),
          concat(st, array(e.getField("t")))
        ).otherwise(st)
    )

    val stepCols = steps.indices.map(i =>
      get(col("m"), lit(i)).as(s"step_${i + 1}_us"))
    sorted
      .select(col("key"), matched.as("m"))
      .filter(size(col("m")) >= 1)
      .select(col("key") +: size(col("m")).cast("long").as("reached") +: stepCols: _*)
  }
}
