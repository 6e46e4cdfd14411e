package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Touch attribution over an event stream: for every conversion event,
  * which earlier event gets the credit — the user's FIRST touch (first
  * event ever) and LAST touch (the event immediately preceding the
  * conversion). The standard marketing/product-analytics join of a
  * conversion back onto its influencing history, done without a join.
  *
  * Spark shape: ONE shuffle on the user key. Both attribution columns
  * and the prior-event count are windows over the SAME
  * (partition, order) spec — (user, time, tie) — so they share a single
  * exchange + sort; the conversion filter then drops the non-conversion
  * rows. No self-join of events onto events (which would shuffle the
  * stream twice and explode on hot users), no per-user collect.
  *
  * Determinism: order ties break on `tieCol`; rows with NULL time are
  * excluded (they have no position in the history).
  *
  * Reference analog: none (events-analytics extension per the build
  * brief; complements [[Funnel]] / [[Sessionize]]).
  */
object Attribution {

  /** (tieCol, userCol, first_touch, last_touch, n_prior) — one row per
    * conversion event (`typeCol === conversionType`). `first_touch` /
    * `last_touch` are NULL (and `n_prior` 0) when the conversion is the
    * user's first event.
    */
  def touchAttribution(
      events: DataFrame,
      userCol: String,
      timeCol: String,
      typeCol: String,
      tieCol: String,
      conversionType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(timeCol), col(tieCol))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    events
      .filter(col(timeCol).isNotNull)
      .select(
        col(tieCol), col(userCol), col(typeCol),
        first(col(typeCol)).over(prior).as("first_touch"),
        lag(col(typeCol), 1).over(w).as("last_touch"),
        count(lit(1)).over(prior).as("n_prior"))
      .filter(col(typeCol) === conversionType)
      .drop(typeCol)
  }
}
