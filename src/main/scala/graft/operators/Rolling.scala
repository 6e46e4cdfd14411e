package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key rolling time-series features: trailing event-time window
  * aggregates and forward-fill — the feature-engineering step between
  * raw MEDS events and model-ready sequences (trailing utilization
  * counts, carry-forward of sparse lab values, ...).
  *
  * Both operators are single-shuffle: one exchange on the key, one
  * in-partition sort, then frame-local computation. Spark's WindowExec
  * evaluates a trailing RANGE frame with a sliding two-pointer pass
  * (rows enter and leave the frame once each), so per-partition cost is
  * O(n) amortized for count/sum — no per-row frame rescans — and the
  * sort spills; nothing about the shape degrades at 100 TB. The key
  * partitioning is the same (patient/user) partitioning the other MEDS
  * chains use, so a pipeline that sessionizes, forward-fills and rolls
  * up reuses ONE exchange.
  *
  * Null-time rows are dropped (a time window is meaningless for
  * statics); callers that need statics union them back, as
  * add_time_derived does.
  */
object Rolling {

  /** Appends `n_trail` (events in `(t - windowUs, t]`, peer-inclusive)
    * and `sum_trail` (sum of non-null `valueCol` in the same frame,
    * 0 when empty) to every row.
    *
    * The frame bound is on the event-time microsecond value, so rows
    * sharing a timestamp are peers and see identical frames in every
    * engine (RANGE semantics) — no tie-break needed for determinism.
    * The sum runs over DECIMAL(38,6): associative, so map-side frame
    * order cannot wiggle low bits.
    */
  def trailingAggregates(
      events: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      windowUs: Long
  ): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col("__us"))
      .rangeBetween(-windowUs, Window.currentRow)
    // NaN is excluded from the sum (one NaN would otherwise poison every
    // later frame of its key) — same value predicate the code-metadata
    // aggregations use.
    val v = events.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
        when(!isnan(col(valueCol)), col(valueCol))
      case _ => col(valueCol)
    }
    events
      .filter(col(timeCol).isNotNull)
      .withColumn("__us", unix_micros(col(timeCol)))
      .withColumn("n_trail", count(lit(1)).over(w))
      .withColumn(
        "sum_trail",
        coalesce(sum(v.cast("decimal(38,6)")).over(w), lit(0)).cast("double"))
      .drop("__us")
  }

  /** Appends `outCol` = the most recent non-null `valueCol` at or
    * before each row's time (the row's own value when present) —
    * pandas `ffill` / Polars `forward_fill` per key.
    *
    * Uses a ROWS frame over (time, tieBreak) so rows with colliding
    * timestamps fill in a deterministic order; `tieBreakCol` must be
    * unique within a key.
    */
  def forwardFill(
      events: DataFrame,
      keyCol: String,
      timeCol: String,
      tieBreakCol: String,
      valueCol: String,
      outCol: String
  ): DataFrame = {
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(tieBreakCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col(timeCol).isNotNull)
      .withColumn(outCol, last(col(valueCol), ignoreNulls = true).over(w))
  }
}
