package graft.operators

import graft.text.TextFunctions.md5Hash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap: standard errors for per-group means over data too
  * large to resample classically. True bootstrap resampling draws n rows
  * from n with replacement — impossible distributed (it needs global
  * coordination per replica); the Poisson approximation gives every row
  * an INDEPENDENT Poisson(1) weight per replica, which preserves the
  * resampling distribution for large n and turns B replicas into one
  * explode + one aggregation — embarrassingly parallel, the standard
  * estimator for confidence intervals at this scale.
  *
  * Weights derive from the (seed, id, replica) md5 hash through the
  * Poisson(1) inverse CDF (a fixed CASE ladder — pure arithmetic, so
  * runs are reproducible across partitionings AND engines; no RNG
  * state). Replica means go through DECIMAL sums; the replica-variance
  * arithmetic is closed-form on those sums.
  *
  * Shape: facts explode ×B (B ~ tens) and partial-aggregate straight
  * down to (group × B) cells — the shuffle carries cells, not the
  * exploded facts; the final per-group reduce is over B-sized frames.
  */
object Bootstrap {

  /** Poisson(1) inverse-CDF cumulative thresholds for k = 0..6 (k = 7
    * absorbs the tail, P ≈ 8e-5): Σ_{j≤k} e⁻¹/j!.
    */
  private val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119)

  private[graft] def poissonWeight(u: Column): Column =
    PoissonCdf.zipWithIndex.foldRight(lit(PoissonCdf.size.toLong)) {
      case ((c, k), rest) => when(u < c, lit(k.toLong)).otherwise(rest)
    }

  /** (by..., n, mean, se_boot): per-group valid-row count, plain mean,
    * and the bootstrap standard error of that mean from `replicas`
    * Poisson resamples (ddof-1 across replica means). Replicas that
    * draw zero total weight (vanishing probability for real groups)
    * are dropped from the variance. NULL/NaN rows are excluded.
    */
  def bootstrapMeanSE(
      df: DataFrame,
      by: Seq[String],
      valueCol: String,
      idCol: String,
      replicas: Int = 32,
      seed: String = "graft"
  ): DataFrame = {
    require(replicas >= 2, s"need >= 2 replicas, got $replicas")
    val v = col(valueCol).cast("double")
    val u = (pmod(
      md5Hash32(concat_ws("|", lit(seed), col("__id").cast("string"), col("b"))),
      lit(1000000L)) + 0.5) / lit(1000000.0)

    val cells = df
      .filter(v.isNotNull && !isnan(v))
      .select((by.map(col) :+ v.as("__v") :+ col(idCol).as("__id")): _*)
      .select((by.map(col) :+ col("__v") :+ col("__id") :+
        explode(sequence(lit(0), lit(replicas - 1))).as("b")): _*)
      .withColumn("__w", poissonWeight(u))
      .groupBy((by.map(col) :+ col("b")): _*)
      .agg(
        sum((col("__w") * col("__v")).cast("decimal(38,6)")).cast("double").as("__wx"),
        sum(col("__w")).as("__wn"),
        count(lit(1)).as("__rows"))
      .withColumn("__m", when(col("__wn") > 0, col("__wx") / col("__wn").cast("double")))

    cells
      .groupBy(by.map(col): _*)
      .agg(
        first(col("__rows")).as("n"),
        count(col("__m")).as("__bn"),
        sum(col("__m").cast("decimal(38,12)")).cast("double").as("__sm"),
        sum((col("__m") * col("__m")).cast("decimal(38,12)")).cast("double").as("__sm2"))
      .select((by.map(col) :+ col("n") :+
        (col("__sm") / col("__bn").cast("double")).as("mean_boot") :+
        when(col("__bn") > 1,
          sqrt(greatest(
            (col("__sm2") - col("__sm") * col("__sm") / col("__bn").cast("double")) /
              (col("__bn") - 1).cast("double"),
            lit(0.0)))).as("se_boot")): _*)
  }
}
