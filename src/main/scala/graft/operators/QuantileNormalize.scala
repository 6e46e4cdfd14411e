package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source quantile normalization: map each group's score
  * distribution onto the CORPUS distribution, so one threshold means the
  * same thing in every slice. A quality score of 0.7 from a chatty crawl
  * and 0.7 from academic PDFs are not the same animal; what transfers is
  * the RANK. Each row gets its within-group percent-rank, then the
  * corpus value at that rank — after which "keep norm ≥ X" removes the
  * same within-slice fraction everywhere while staying in the corpus's
  * value units.
  *
  * Scale shape: the within-group percent-rank is a window partitioned by
  * the group (sorted once per group partition — no global sort), and the
  * corpus side never materializes a global window: the reference is
  * `nBins` corpus quantiles from ONE aggregate (R-7 `percentile`, which
  * flips to the mergeable `percentile_approx` sketch under
  * [[Quantiles.ApproxKey]] — the 100 TB path) broadcast back as a
  * single array row. Ranks tie-break by `idCol` so the output is
  * deterministic row-for-row.
  */
object QuantileNormalize {

  /** Output: (id, group, value, pr, bin, norm) — `pr` the within-group
    * percent rank, `bin` = ⌈pr·nBins⌉ clamped to [1, nBins], `norm` the
    * corpus quantile at bin/nBins (exact R-7 at oracle scale, sketch
    * under the session switch). NULL/NaN values are dropped.
    */
  def quantileNormalize(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String,
      nBins: Int = 20): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val v = col(valueCol).cast("double")
    val base = df
      .filter(v.isNotNull && !isnan(v))
      .select(col(idCol).as("id"), col(groupCol).as("group"), v.as("value"))
    val exact = Quantiles.resolveExact(df.sparkSession, exact = true)
    val probes = array((1 to nBins).map(b => lit(b.toDouble / nBins)): _*)
    val ref = base.agg(Quantiles.q(col("value"), probes, exact).as("__ref"))
    val pr = percent_rank().over(
      Window.partitionBy(col("group")).orderBy(col("value"), col("id")))
    base
      .withColumn("pr", pr)
      .crossJoin(broadcast(ref))
      .withColumn("bin",
        greatest(lit(1L), least(lit(nBins.toLong), ceil(col("pr") * nBins).cast("long"))))
      .withColumn("norm", element_at(col("__ref"), col("bin").cast("int")))
      .drop("__ref")
  }
}
