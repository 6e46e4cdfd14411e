package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiling: per-column row/null/distinct counts and
  * min/max — the data-validation stage that gates every production
  * ingest (schema drift, null explosions, cardinality regressions).
  *
  * ALL columns profile in a SINGLE aggregation over one scan: the agg
  * emits every per-column statistic in one row (Catalyst plans the
  * multi-countDistinct with one Expand, still one pass over the data,
  * partial-aggregated map-side), which is then unpivoted to one row per
  * column. Profiling k columns costs one scan, not k.
  *
  * Output (long format, engine-neutral types): `col_name`, `n`,
  * `n_null`, `n_distinct` (exact — it feeds the DuckDB oracle; swap in
  * approx_count_distinct for quick looks at 100 TB), `min_num`/
  * `max_num` (numeric and timestamp columns, as double / epoch-micros),
  * `min_str`/`max_str` (string columns).
  */
object Profile {

  /** Fixed-width histogram of a numeric column, optionally per group:
    * (group..., bin, bin_lo, n) where bin = floor(value / width). One
    * groupBy (map-side combined to bins×groups rows per partition);
    * null and NaN values are excluded. The distribution-drilldown
    * companion to `profile`'s min/max.
    */
  def histogram(
      df: DataFrame,
      valueCol: String,
      width: Double,
      by: Seq[String] = Nil
  ): DataFrame = {
    require(width > 0, "width must be positive")
    val v = col(valueCol).cast("double")
    val keep = df.schema(valueCol).dataType match {
      case DoubleType | FloatType => col(valueCol).isNotNull && !isnan(col(valueCol))
      case _                      => col(valueCol).isNotNull
    }
    df.filter(keep)
      .withColumn("bin", floor(v / width))
      .groupBy(by.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", col("bin") * width)
      .select(by.map(col) ++ Seq(col("bin"), col("bin_lo"), col("n")): _*)
  }

  /** Per-group quantile summary: one row per (group, p) with the exact
    * R-7 (linear-interpolation) quantile — the five-number-summary
    * companion to [[histogram]], and the fit step [[Outliers.winsorize]]
    * / robust scaling specialize. ONE group aggregate; `percentile`
    * takes the whole probe list in a single pass. Exact quantiles hold
    * a group's sorted values — fine for vocabulary-sized groups (the
    * oracle case); at 100 TB pass `exact = false` or set
    * [[Quantiles.ApproxKey]] on the session for `percentile_approx`'s
    * mergeable sketch, same call shape (error bound on [[Quantiles]]).
    */
  def quantileSummary(
      df: DataFrame,
      by: Seq[String],
      valueCol: String,
      ps: Seq[Double],
      exact: Boolean = true
  ): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"bad probe list $ps")
    val v = col(valueCol).cast("double")
    val ex = Quantiles.resolveExact(df.sparkSession, exact)
    df.filter(v.isNotNull && !isnan(v))
      .groupBy(by.map(col): _*)
      .agg(Quantiles.q(v, array(ps.map(lit): _*), ex).as("__qs"))
      .select(by.map(col) :+ posexplode(col("__qs")): _*)
      .select(by.map(col) :+
        element_at(array(ps.map(lit): _*), col("pos") + 1).as("p") :+
        col("col").as("q"): _*)
  }

  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val specs = names.map { n =>
      val dt = df.schema(n).dataType
      val numeric = dt match {
        case _: NumericType => Some(col(n).cast("double"))
        case TimestampType  => Some(unix_micros(col(n)).cast("double"))
        case _              => None
      }
      val str = dt match {
        case StringType => Some(col(n))
        case _          => None
      }
      (n, numeric, str)
    }
    val aggs = specs.flatMap { case (n, num, str) =>
      Seq(
        count(when(col(n).isNull, lit(1))).as(s"__null_$n"),
        countDistinct(col(n)).as(s"__dist_$n"),
        num.map(c => min(c)).getOrElse(lit(null).cast("double")).as(s"__minn_$n"),
        num.map(c => max(c)).getOrElse(lit(null).cast("double")).as(s"__maxn_$n"),
        str.map(c => min(c)).getOrElse(lit(null).cast("string")).as(s"__mins_$n"),
        str.map(c => max(c)).getOrElse(lit(null).cast("string")).as(s"__maxs_$n")
      )
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = array(specs.map { case (n, _, _) =>
      struct(
        lit(n).as("col_name"),
        col("__n").as("n"),
        col(s"__null_$n").as("n_null"),
        col(s"__dist_$n").as("n_distinct"),
        col(s"__minn_$n").as("min_num"),
        col(s"__maxn_$n").as("max_num"),
        col(s"__mins_$n").as("min_str"),
        col(s"__maxs_$n").as("max_str"))
    }: _*)
    row.select(explode(perCol).as("p")).select("p.*")
  }
}
