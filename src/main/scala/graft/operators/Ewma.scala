package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average per key — the recursive
  * smoother (`s_i = α·x_i + (1−α)·s_{i−1}`) that a plain window frame
  * cannot express (every prefix would need its own geometric re-weight).
  * Used for sensor smoothing, rate baselines, drift tracking.
  *
  * Shape: ONE shuffle on the key collects each key's series into a
  * time-sorted array, and a single `aggregate` HOF fold computes the
  * recurrence in O(n) per key — no driver loop, no per-row state op,
  * no O(n²) re-weighting. The per-key array is the same bounded-series
  * contract as [[Funnel]] / tokenization: series length is events-per-
  * key, and a key too hot to hold is a data problem this op surfaces.
  *
  * The fold is plain double arithmetic in a fixed order (sorted by
  * time, ties by `tieCol`), so results are partitioning-independent
  * and reproducible in any engine with a list-fold (the oracle uses
  * DuckDB's `list_reduce` over the same sorted list).
  */
object Ewma {

  /** (key, n, ewma): the final smoothed value per key after folding its
    * whole series in time order; seeds from the first value. NULL/NaN
    * observations and null times are excluded; keys with no valid
    * observation don't appear.
    */
  def ewmaLast(
      events: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      tieCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha not in (0,1]")
    val v = col(valueCol).cast("double")
    val sorted = events
      .filter(col(timeCol).isNotNull && v.isNotNull && !isnan(v))
      .select(col(keyCol).as("key"),
        struct(unix_micros(col(timeCol)).as("t"), col(tieCol).as("tb"), v.as("v")).as("e"))
      .groupBy("key")
      .agg(sort_array(collect_list(col("e"))).as("es"))
    sorted.select(
      col("key"),
      size(col("es")).cast("long").as("n"),
      aggregate(
        expr("slice(es, 2, size(es))"),
        col("es").getItem(0).getField("v"),
        (acc, e) => lit(alpha) * e.getField("v") + lit(1.0 - alpha) * acc
      ).as("ewma"))
  }
}
