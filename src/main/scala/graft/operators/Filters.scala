package graft.operators

import graft.meds.Meds
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row- and patient-level filters over MEDS measurement tables.
  *
  * Reference: src/MEDS_transforms/filters/filter_measurements.py and
  * filters/filter_patients.py.
  */
object Filters {

  /** Keep only measurements whose (code, modifiers) group passes the
    * occurrence thresholds recorded in `codeMetadata`
    * (filter_measurements.py:100-137).
    *
    * The metadata table is vocabulary-sized, so the permissible-code set is
    * always broadcast: the (possibly 100 TB) measurement table is filtered
    * with a broadcast LEFT SEMI join — no shuffle of the fact side, and the
    * input row order is untouched (the reference preserves order with an
    * explicit row index + re-sort; a semi join needs neither).
    */
  def filterMeasurements(
      df: DataFrame,
      codeMetadata: DataFrame,
      minPatientsPerCode: Option[Long] = None,
      minOccurrencesPerCode: Option[Long] = None,
      codeModifiers: Seq[String] = Nil
  ): DataFrame = {
    val conds = minPatientsPerCode.map(m => col(CodeMetadata.CodeNPatients) >= m).toSeq ++
      minOccurrencesPerCode.map(m => col(CodeMetadata.CodeNOccurrences) >= m).toSeq
    if (conds.isEmpty) return df
    val joinCols = Meds.Code +: codeModifiers
    val allowed = codeMetadata.filter(conds.reduce(_ && _)).select(joinCols.map(col): _*)
    df.join(broadcast(allowed), joinCols, "left_semi")
  }

  /** Keep patients with at least `min` measurement rows
    * (filter_patients.py:15-87: `pl.col("time").count().over("patient_id")`
    * — Polars `count` over a window counts non-null `time` values).
    * One shuffle on patient_id; the window aggregate is partial-agg
    * friendly and the same exchange is reusable by downstream
    * patient-keyed ops.
    *
    * Round-13 shape adjudication (MEASURED, kept the window): an
    * agg + null-safe SHUFFLE_HASH semi-join variant (narrow
    * (patient_id, count) exchange, no full-width sort) was built and
    * benchmarked same-host — it read WORSE at both 10× and 100×
    * (q_filter_patients_meas sf10 1.29 → 2.16 s, sf100 7.4 → 9.2 s;
    * q_filter_patients_events sf100 8.6 → 22.6-46.0 s): the join
    * doubles the fact scan, its `<=>` condition re-keys the exchange to
    * (coalesce(pid), isnull(pid)) which kills ReusedExchange across the
    * pipeline's replicated consumer subtrees, and the partition-only
    * window's sort is cheap next to that (Spark's radix sort on the
    * already-exchanged partition). The window form IS the measured-
    * optimal shape here.
    */
  def filterPatientsByNumMeasurements(df: DataFrame, min: Long): DataFrame = {
    val w = Window.partitionBy(Meds.PatientId)
    df.withColumn("__n", count(col(Meds.Time)).over(w))
      .filter(col("__n") >= min)
      .drop("__n")
  }

  /** Keep patients with at least `min` events, i.e. unique non-null
    * timepoints (filter_patients.py:90-176:
    * `pl.col("time").n_unique().over("patient_id")` — note Polars
    * `n_unique` counts a null time as a distinct value, hence the
    * null-inclusive count here).
    *
    * Spark windows don't support countDistinct, so the distinct-time count
    * is `size(collect_set(time))` per patient window (+1 when any null time
    * exists, since collect_set drops nulls). Per-patient distinct-time
    * cardinality is bounded in practice, so the set stays small even at
    * 100 TB total scale. A countDistinct-aggregate + semi-join variant
    * was MEASURED WORSE at every scale (see
    * [[filterPatientsByNumMeasurements]]'s adjudication note; the
    * distinct aggregate costs a second full-key exchange on top of the
    * doubled scan).
    */
  def filterPatientsByNumEvents(df: DataFrame, min: Long): DataFrame = {
    val w = Window.partitionBy(Meds.PatientId)
    val nUnique = size(collect_set(col(Meds.Time)).over(w)) +
      max(when(col(Meds.Time).isNull, 1).otherwise(0)).over(w)
    df.withColumn("__n", nUnique)
      .filter(col("__n") >= min)
      .drop("__n")
  }
}
