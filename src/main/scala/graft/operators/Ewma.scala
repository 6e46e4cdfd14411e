package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Holt double exponential smoothing per key — EWMA plus a smoothed
    * linear TREND, the recursive pair
    * `l_i = α·x_i + (1−α)·(l_{i−1} + t_{i−1})`,
    * `t_i = β·(l_i − l_{i−1}) + (1−β)·t_{i−1}`
    * that level-only smoothing lags behind on drifting series. Returns
    * (key, n, level, trend, forecast) where forecast = level + trend is
    * the one-step-ahead prediction — the drift-aware rate baseline.
    *
    * Same shape and portability contract as [[ewmaLast]]: ONE key
    * shuffle, a sorted-array fold with the state held as a 2-element
    * double array, fixed fold order (time, then `tieCol`), plain IEEE
    * arithmetic — the oracle replays the identical fold with DuckDB's
    * `list_reduce`. Seeds: l₀ = x₀, t₀ = 0 (the parameter-free
    * convention; a trend seed of x₁−x₀ would need a 2-element
    * lookahead and buys nothing at corpus scale).
    *
    * NOTE the smoothing factors appear as (1 − α) computed HERE in
    * Scala and as `1 − CAST(α AS DOUBLE)` in the oracle — both are the
    * same IEEE subtraction, so 0.3-style factors that have no exact
    * binary form still agree bit-for-bit.
    *
    * `tieCol` must be unique within (key, time): the collected structs
    * sort by (t, tie, value), so a duplicated tie value falls back to
    * ordering by value — divergent from an engine replaying the fold
    * ordered by (time, tie) alone. Same contract as
    * [[Changepoint.cusum]].
    */
  def holtLast(
      events: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      tieCol: String,
      alpha: Double,
      beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha not in (0,1]")
    require(beta >= 0 && beta <= 1, s"beta $beta not in [0,1]")
    val v = col(valueCol).cast("double")
    val sorted = events
      .filter(col(timeCol).isNotNull && v.isNotNull && !isnan(v))
      .select(col(keyCol).as("key"),
        struct(unix_micros(col(timeCol)).as("t"), col(tieCol).as("tb"), v.as("v")).as("e"))
      .groupBy("key")
      .agg(sort_array(collect_list(col("e"))).as("es"))
    def newLevel(acc: Column, x: Column): Column =
      lit(alpha) * x + lit(1.0 - alpha) * (element_at(acc, 1) + element_at(acc, 2))
    val state = aggregate(
      expr("slice(es, 2, size(es))"),
      array(col("es").getItem(0).getField("v"), lit(0.0)),
      (acc, e) => {
        val x = e.getField("v")
        array(
          newLevel(acc, x),
          lit(beta) * (newLevel(acc, x) - element_at(acc, 1))
            + lit(1.0 - beta) * element_at(acc, 2))
      })
    sorted.select(
      col("key"),
      size(col("es")).cast("long").as("n"),
      state.as("st"))
      .select(
        col("key"), col("n"),
        element_at(col("st"), 1).as("level"),
        element_at(col("st"), 2).as("trend"),
        (element_at(col("st"), 1) + element_at(col("st"), 2)).as("forecast"))
  }

  /** Holt–Winters ADDITIVE triple exponential smoothing per key: level +
    * trend + an m-slot seasonal cycle, the recursive triple
    * `l_i = α·(x_i − s_{i mod m}) + (1−α)·(l_{i−1} + t_{i−1})`,
    * `t_i = β·(l_i − l_{i−1}) + (1−β)·t_{i−1}`,
    * `s'_{i mod m} = γ·(x_i − l_i) + (1−γ)·s_{i mod m}` —
    * what [[holtLast]] becomes when the series has a KNOWN cycle (hourly
    * batches, weekday/weekend): the forecast stops chasing the cycle as
    * if it were drift. `period` is position-based (every m-th
    * observation shares a seasonal slot — the resampled-grid contract;
    * run [[Rolling]]'s resampler first for wall-clock seasons).
    *
    * Same shape and portability contract as [[holtLast]]: ONE key
    * shuffle, a single sorted-array fold; the state rides a
    * (3+m)-element double array [i, level, trend, s_0..s_{m−1}] where
    * the counter i is exact in doubles far past any series length, and
    * the one written seasonal slot is rebuilt with an index-conditional
    * transform (both engines replay the identical update). Seeds:
    * l₀ = x₀, t₀ = 0, seasonals 0. Output: (key, n, level, trend,
    * forecast) with forecast = level + trend + s_{next} — the
    * one-step-ahead, season-aware prediction.
    */
  def holtWintersLast(
      events: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      tieCol: String,
      alpha: Double,
      beta: Double,
      gamma: Double,
      period: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha not in (0,1]")
    require(beta >= 0 && beta <= 1, s"beta $beta not in [0,1]")
    require(gamma >= 0 && gamma <= 1, s"gamma $gamma not in [0,1]")
    require(period >= 2, s"period must be >= 2, got $period")
    val m = period
    val v = col(valueCol).cast("double")
    val sorted = events
      .filter(col(timeCol).isNotNull && v.isNotNull && !isnan(v))
      .select(col(keyCol).as("key"),
        struct(unix_micros(col(timeCol)).as("t"), col(tieCol).as("tb"), v.as("v")).as("e"))
      .groupBy("key")
      .agg(sort_array(collect_list(col("e"))).as("es"))
    // state = [i, level, trend, s_0 .. s_{m-1}]; x_0 consumed by the seed
    // (i starts at 1: the first fold step is observation index 1)
    val init = concat(
      array(lit(1.0), col("es").getItem(0).getField("v"), lit(0.0)),
      array((0 until m).map(_ => lit(0.0)): _*))
    val state = aggregate(
      expr("slice(es, 2, size(es))"),
      init,
      (acc, e) => {
        val x = e.getField("v")
        val i = element_at(acc, 1)
        val lvl = element_at(acc, 2)
        val tr = element_at(acc, 3)
        // i mod m as an exact small double -> 1-based state slot 4 + idx
        val idx = (i - floor(i / m) * m).cast("int")
        val sCur = element_at(acc, idx + lit(4))
        val nl = lit(alpha) * (x - sCur) + lit(1.0 - alpha) * (lvl + tr)
        val nt = lit(beta) * (nl - lvl) + lit(1.0 - beta) * tr
        val ns = lit(gamma) * (x - nl) + lit(1.0 - gamma) * sCur
        concat(
          array(i + 1.0, nl, nt),
          transform(sequence(lit(0), lit(m - 1)),
            j => when(j === idx, ns).otherwise(element_at(acc, j + lit(4)))))
      })
    val n = size(col("es")).cast("long")
    val nextIdx = (element_at(col("__st"), 1) -
      floor(element_at(col("__st"), 1) / m) * m).cast("int")
    sorted
      .select(col("key"), n.as("n"), state.as("__st"))
      .select(
        col("key"), col("n"),
        element_at(col("__st"), 2).as("level"),
        element_at(col("__st"), 3).as("trend"),
        (element_at(col("__st"), 2) + element_at(col("__st"), 3) +
          element_at(col("__st"), nextIdx + lit(4))).as("forecast"))
  }
}
