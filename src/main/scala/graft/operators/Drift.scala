package graft.operators

import graft.plans.Materialize.PinOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Whole-table drift report — the one-call answer to "did THIS batch
  * move, on which features": per numeric column, the two-sample
  * Kolmogorov–Smirnov statistic ([[Hypothesis.ksTest]] — shape-
  * sensitive, binless) next to the Population Stability Index
  * ([[Stats.psi]] — the binned magnitude gauges alerting thresholds are
  * calibrated in). One instrument per failure mode; a column flagged by
  * both is drifting in shape AND mass.
  */
object Drift {

  /** Melt `cols` into a (feature, value) frame — ONE fact scan for the
    * whole report, melt factor = |cols| (loudly capped: a melt over
    * hundreds of columns multiplies the fact table by hundreds; audit
    * wide tables in batches) — then run KS and PSI grouped by feature
    * and join the two vocab-sized result frames. `inRef` marks the
    * reference rows (e.g. last week's partition).
    *
    * Output per feature: (feature, n_ref, n_cur, d, ks, psi).
    */
  def driftReport(
      df: DataFrame,
      cols: Seq[String],
      inRef: Column,
      psiBins: Int = 10): DataFrame = {
    require(cols.nonEmpty, "driftReport needs at least one column")
    require(cols.size <= 64,
      s"driftReport melts the fact table x|cols|; ${cols.size} columns " +
        "exceed the 64-column audit contract — run in batches")
    val melted = df
      .select(inRef.as("__ref"),
        explode(array(cols.map(c =>
          struct(lit(c).as("feature"), col(c).cast("double").as("v"))): _*)).as("__m"))
      .select(col("__ref"), col("__m.feature").as("feature"), col("__m.v").as("v"))
      .pin(false) // consumed by both the KS and the PSI pass
    val ks = Hypothesis.ksTest(melted, Seq("feature"), "v", col("__ref"))
      .select(col("feature"), col("n_a").as("n_ref"), col("n_b").as("n_cur"),
        col("d"), col("ks"))
    val psi = Stats.psi(melted, Seq("feature"), "v", col("__ref"), psiBins)
    ks.join(psi, Seq("feature"), "left")
  }

  /** Per-feature leakage screen: the single-feature ROC AUC of every
    * numeric column against a label, in one melted pass — a feature
    * whose lone AUC approaches 1 (or 0) predicts the label suspiciously
    * well BY ITSELF, the classic symptom of target leakage (the label
    * snuck into a feature) or of a proxy that will dominate training.
    * `separation` = 2·|AUC − ½| reads the same for both directions.
    * Same ≤64-column melt contract as [[driftReport]].
    */
  def featureAucScreen(
      df: DataFrame,
      cols: Seq[String],
      label: Column): DataFrame = {
    require(cols.nonEmpty, "featureAucScreen needs at least one column")
    require(cols.size <= 64,
      s"featureAucScreen melts the fact table x|cols|; ${cols.size} columns " +
        "exceed the 64-column audit contract — run in batches")
    val r6 = graft.functions.Portable.r6 _
    val melted = df
      .select(label.as("__y"),
        explode(array(cols.map(c =>
          struct(lit(c).as("feature"), col(c).cast("double").as("v"))): _*)).as("__m"))
      .select(col("__y"), col("__m.feature").as("feature"), col("__m.v").as("v"))
    Evaluation.rocAuc(melted, Seq("feature"), "v", col("__y"))
      .select(col("feature"), col("n_pos"), col("n_neg"),
        r6(col("auc")).as("auc"),
        when(col("auc").isNotNull, r6(abs(col("auc") - 0.5) * 2.0)).as("separation"))
  }
}
