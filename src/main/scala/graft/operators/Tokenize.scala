package graft.operators

import graft.meds.Meds
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenization: convert a normalized MEDS measurement table into
  * per-patient sequence form for deep-learning consumption.
  *
  * Reference: src/MEDS_transforms/transforms/tokenization.py.
  * Determinism note: the reference relies on the file's existing
  * (patient, time) sort; Spark has no implicit order, so every list here is
  * ordered explicitly via sort_array over (time, code, value)-keyed structs
  * — the result is identical for identically-sorted inputs and, unlike the
  * reference, independent of physical row layout.
  */
object Tokenize {
  private val SecondsPerDay = 86400.0

  /** Static data + per-patient schema: static codes/values as lists, plus
    * `start_time` (min dynamic time) and the sorted list of unique dynamic
    * times (tokenization.py:107-163).
    */
  def staticsAndSchema(df: DataFrame): DataFrame = {
    val (static, dynamic) = Meds.splitStaticAndDynamic(df)
    // static code/value lists sort as aligned (code, value) structs —
    // plain collect_list order would vary with partition layout
    val staticByPatient = static
      .groupBy(Meds.PatientId)
      .agg(sort_array(collect_list(struct(col(Meds.Code), col(Meds.NumericValue)))).as("__s"))
      .select(
        col(Meds.PatientId),
        col(s"__s.${Meds.Code}").as(Meds.Code),
        col(s"__s.${Meds.NumericValue}").as(Meds.NumericValue)
      )
    val schemaByPatient = dynamic
      .groupBy(Meds.PatientId)
      .agg(
        min(col(Meds.Time)).as("start_time"),
        sort_array(collect_set(col(Meds.Time))).as(Meds.Time)
      )
    staticByPatient.join(schemaByPatient, Seq(Meds.PatientId), "inner")
  }

  /** Exploded (scalar-typed) view of the per-patient schema: one row per
    * (patient, unique dynamic time) with start_time and the 0-based event
    * index. Equivalent information to [[staticsAndSchema]]'s list form.
    */
  def schemaExploded(df: DataFrame): DataFrame = {
    val dynamic = df.filter(col(Meds.Time).isNotNull)
    dynamic
      .groupBy(Meds.PatientId)
      .agg(
        min(col(Meds.Time)).as("start_time"),
        sort_array(collect_set(col(Meds.Time))).as("__times")
      )
      .select(
        col(Meds.PatientId),
        col("start_time"),
        posexplode(col("__times")).as(Seq("event_idx", Meds.Time))
      )
  }

  /** Per-patient event sequences: one row per patient with
    * `time_delta_days: list[double]` (NaN for the first event) and nested
    * `code` / `numeric_value` lists, one inner list per unique time
    * (tokenization.py:166-216).
    */
  def seqOfPatientEvents(df: DataFrame): DataFrame = {
    val (_, dynamic) = Meds.splitStaticAndDynamic(df)
    val perEvent = dynamic
      .groupBy(Meds.PatientId, Meds.Time)
      .agg(
        sort_array(collect_list(struct(col(Meds.Code), col(Meds.NumericValue)))).as("__m")
      )
      .select(
        col(Meds.PatientId),
        col(Meds.Time),
        col("__m.code").as(Meds.Code),
        col("__m.numeric_value").as(Meds.NumericValue)
      )
    perEvent
      .groupBy(Meds.PatientId)
      .agg(sort_array(collect_list(struct(col(Meds.Time), col(Meds.Code), col(Meds.NumericValue)))).as("__e"))
      .select(
        col(Meds.PatientId),
        transform(
          sequence(lit(0), size(col("__e")) - 1),
          i =>
            when(i === 0, lit(Double.NaN)).otherwise(
              (unix_micros(col("__e")(i)(Meds.Time)) - unix_micros(col("__e")(i - 1)(Meds.Time))) /
                lit(SecondsPerDay * 1e6)
            )
        ).as("time_delta_days"),
        col(s"__e.${Meds.Code}").as(Meds.Code),
        col(s"__e.${Meds.NumericValue}").as(Meds.NumericValue)
      )
  }

  /** Exploded scalar view of [[seqOfPatientEvents]]: one row per (patient,
    * unique time) with the day-delta to the previous event (null for the
    * first), the measurement count, and the sorted codes joined as one
    * string — deterministic and verifiable without list-type comparisons.
    */
  def seqsExploded(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dynamic = df.filter(col(Meds.Time).isNotNull)
    val perEvent = dynamic
      .groupBy(Meds.PatientId, Meds.Time)
      .agg(
        count(lit(1)).as("n_measurements"),
        concat_ws(",", sort_array(collect_list(col(Meds.Code)))).as("codes")
      )
    val w = Window.partitionBy(Meds.PatientId).orderBy(Meds.Time)
    perEvent.withColumn(
      "time_delta_days",
      (unix_micros(col(Meds.Time)) - unix_micros(lag(col(Meds.Time), 1).over(w))) /
        lit(SecondsPerDay * 1e6)
    )
  }
}
