package graft.pipeline

import graft.text.TextFunctions.md5Hash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Membership depends ONLY on (seed, id) — not on partitioning, cluster
  * size, row order, or Spark's RNG — so a sample is reproducible across
  * runs and engines, composable (the same (seed, frac) always selects the
  * same documents for an incremental re-run), and auditable (any engine
  * with md5 can replay the decision). That is the property
  * `DataFrame.sample` lacks at 100 TB: its per-partition RNG reshuffles
  * membership whenever the scan parallelism changes.
  *
  * Both samplers are pure filters: no shuffle, no state, they fuse into
  * the scan.
  */
object Sampling {

  private val Scale = 1000000L

  /** Keep predicate: md5-derived hash of (seed | id) lands below
    * `frac` of the hash space (millionth-resolution).
    */
  def sampleHash(id: Column, frac: Double, seed: String): Column = {
    require(frac >= 0 && frac <= 1, s"frac $frac not in [0,1]")
    pmod(md5Hash32(concat_ws("|", lit(seed), id.cast("string"))), lit(Scale)) <
      math.round(frac * Scale)
  }

  /** Deterministic Bernoulli sample of ~`frac` of the rows. */
  def deterministicSample(df: DataFrame, idCol: String, frac: Double, seed: String): DataFrame =
    df.filter(sampleHash(col(idCol), frac, seed))

  /** Exactly-`n` deterministic sample: the n rows whose (seed, id) hash is
    * smallest (ties broken by id). Compiles to TakeOrderedAndProject —
    * each partition keeps its local n, the driver merges heaps; no global
    * sort, no RNG. The "give me exactly 10k eval docs, reproducibly" op.
    */
  def deterministicSampleN(df: DataFrame, idCol: String, n: Int, seed: String): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    df.withColumn("__h", md5Hash32(concat_ws("|", lit(seed), col(idCol).cast("string"))))
      .orderBy(col("__h"), col(idCol))
      .limit(n)
      .drop("__h")
  }

  /** Exactly-`n` per group, deterministically: each group keeps the n
    * rows with the smallest (seed, id) hash (ties by id). A
    * group-partitioned window — one shuffle on the group key, each
    * partition sorts only its own groups; no global sort, no RNG. The
    * "cap every language / source / domain at n docs" op where the
    * stratified FRACTION sampler can't promise exact counts.
    */
  def deterministicNPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      n: Int,
      seed: String
  ): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("__h"), col(idCol))
    df.withColumn("__h", md5Hash32(concat_ws("|", lit(seed), col(idCol).cast("string"))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__h", "__rn")
  }

  /** Stratified deterministic sample: per-stratum keep fractions (e.g.
    * language quotas — downsample English, keep all low-resource), strata
    * not listed fall back to `defaultFrac`. One CASE expression; still a
    * pure filter.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      fracs: Map[String, Double],
      defaultFrac: Double = 0.0,
      seed: String = "graft"
  ): DataFrame = {
    require((fracs.values.toSeq :+ defaultFrac).forall(f => f >= 0 && f <= 1), "fractions must be in [0,1]")
    val threshold = fracs.toSeq.sortBy(_._1).foldLeft(lit(math.round(defaultFrac * Scale))) {
      case (acc, (stratum, frac)) =>
        when(col(stratumCol) === stratum, lit(math.round(frac * Scale))).otherwise(acc)
    }
    df.filter(
      pmod(md5Hash32(concat_ws("|", lit(seed), col(idCol).cast("string"))), lit(Scale)) < threshold)
  }
}
