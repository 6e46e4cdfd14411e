package graft.operators

import graft.meds.Meds
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Within-event measurement reordering by code patterns.
  *
  * Reference: src/MEDS_transforms/transforms/reorder_measurements.py:
  * within each (patient, time) event, measurements are ordered by the index
  * of the FIRST regex in `orderedCodePatterns` matching their code;
  * non-matching codes sort last.
  */
object Reorder {

  /** The order-index column expression: first-matching pattern index, else
    * `patterns.length` (reorder_measurements.py:126-136).
    */
  def codeOrderIdx(patterns: Seq[String]): Column =
    patterns.zipWithIndex.foldRight(lit(patterns.length): Column) {
      case ((p, i), acc) => when(col(Meds.Code).rlike(p), lit(i)).otherwise(acc)
    }

  /** Reorder measurements within events. The pattern match runs against the
    * vocabulary-sized metadata table and reaches the fact table through a
    * broadcast join (reorder_measurements.py:138-146 precomputes indices on
    * code_metadata for the same reason: regexes run once per code, not once
    * per row). Order is realized as a patient-co-partitioned sort.
    */
  def reorderMeasurements(
      df: DataFrame,
      codeMetadata: DataFrame,
      patterns: Seq[String],
      codeModifiers: Seq[String] = Nil
  ): DataFrame = {
    if (patterns.isEmpty) return df
    val joinCols = Meds.Code +: codeModifiers
    val idx = codeMetadata
      .select(joinCols.map(col): _*)
      .distinct()
      .withColumn("__code_order_idx", codeOrderIdx(patterns))
    df.join(broadcast(idx), joinCols, "left")
      .repartition(col(Meds.PatientId))
      .sortWithinPartitions(col(Meds.PatientId), col(Meds.Time), col("__code_order_idx"))
      .drop("__code_order_idx")
  }
}
