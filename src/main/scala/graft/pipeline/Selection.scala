package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quota selection: the "keep the best k documents per group" pass of a
  * training-data pipeline (per-language quality quotas, per-domain caps,
  * per-source balancing).
  */
object Selection {

  /** Top `k` rows of each group by `scoreCol` (descending), ties broken by
    * ascending `tieBreakCol` for determinism. The window is PARTITIONED by
    * the group — one shuffle on the group key, each group ranked
    * independently in parallel; nothing global, so group cardinality and
    * corpus size scale freely. (Contrast with a global top-k, which uses
    * [[graft.functions.TopKByScore]]'s bounded heap instead.)
    */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      k: Int,
      tieBreakCol: String
  ): DataFrame = {
    require(groupCols.nonEmpty, "topKPerGroup needs at least one group column")
    require(k > 0, s"k must be positive, got $k")
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(tieBreakCol).asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
