package graft.operators

import graft.meds.Meds
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Outlier occlusion: null-out numeric values beyond a standard-deviation
  * cutoff from their code's mean, flagging each value's inlier status.
  *
  * Reference: src/MEDS_transforms/transforms/occlude_outliers.py:58-101.
  */
object Outliers {

  /** @param codeMetadata per-code stats; must either carry `values/mean` /
    *   `values/std` or the (`values/n_occurrences`, `values/sum`,
    *   `values/sum_sqd`) triple they derive from
    *   (occlude_outliers.py:71-78).
    *
    * The metadata side is vocabulary-sized → broadcast LEFT join; the fact
    * table is never shuffled.
    */
  def occludeOutliers(
      df: DataFrame,
      codeMetadata: DataFrame,
      stddevCutoff: Double,
      codeModifiers: Seq[String] = Nil
  ): DataFrame = {
    val joinCols = Meds.Code +: codeModifiers
    val withStats =
      if (codeMetadata.columns.contains("values/mean") && codeMetadata.columns.contains("values/std"))
        codeMetadata
      else CodeMetadata.withMeanStd(codeMetadata)
    val stats = withStats.select((joinCols :+ "values/mean" :+ "values/std").map(col): _*)

    val v = col(Meds.NumericValue)
    val inlier = abs(v - col("values/mean")) <= lit(stddevCutoff) * col("values/std")

    df.join(broadcast(stats), joinCols, "left")
      .withColumn("numeric_value/is_inlier", inlier)
      .withColumn(Meds.NumericValue, when(inlier, v))
      .drop("values/mean", "values/std")
  }
}
