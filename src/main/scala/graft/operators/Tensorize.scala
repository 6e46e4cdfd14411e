package graft.operators

import graft.meds.Meds
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tensorization: convert per-patient ragged event sequences (the output of
  * [[Tokenize.seqOfPatientEvents]]) into dense, fixed-shape tensors with
  * validity masks, ready for deep-learning batch collation.
  *
  * Reference: src/MEDS_transforms/transforms/tensorization.py:14-138
  * (convert_to_NRT) builds nested ragged tensors from the tokenized
  * pull-through columns. Spark has no ragged-tensor type, so the graft form
  * is the standard dense+mask encoding: every patient row carries
  *   - time_delta_days: array<double>[maxEvents]   (0.0-padded, NaN kept for
  *     the first event, matching the reference's leading NaN delta)
  *   - event_mask:      array<boolean>[maxEvents]
  *   - code:            array<array<long>>[maxEvents][maxMeas] (0-padded —
  *     vocab index 0 is reserved for padding, fit_vocabulary_indices.py:120)
  *   - code_mask:       array<array<boolean>>[maxEvents][maxMeas]
  *   - numeric_value:   array<array<double>>[maxEvents][maxMeas] (0.0-padded)
  *   - numeric_value_mask: true only where a real, non-null value exists.
  *
  * Everything is pure Catalyst array expressions — no UDFs, no driver
  * collection; each patient row tensorizes independently so the operation
  * is embarrassingly parallel at any scale. Sequences longer than the caps
  * are truncated from the front (keep-earliest), like the reference's
  * reader-side windowing.
  */
object Tensorize {

  /** Pad/truncate an array column to exactly `n` entries with `pad`. */
  private def padTo(arr: Column, n: Int, pad: Column): Column =
    transform(sequence(lit(1), lit(n)), i => coalesce(try_element_at(arr, i), pad))

  private def maskTo(arr: Column, n: Int): Column =
    transform(sequence(lit(1), lit(n)), i => i <= size(arr))

  /** Dense-encode the output of [[Tokenize.seqOfPatientEvents]].
    *
    * @param seqs frame with `patient_id`, `time_delta_days: array<double>`,
    *             `code: array<array<T>>`, `numeric_value: array<array<double>>`
    * @param maxEvents cap on events per patient
    * @param maxMeasurementsPerEvent cap on measurements per event
    */
  def toDense(seqs: DataFrame, maxEvents: Int, maxMeasurementsPerEvent: Int): DataFrame = {
    val m = maxMeasurementsPerEvent
    // dataframe-qualified references: a bare col("time_delta_days") in the
    // mask expressions would lateral-alias-resolve to the PADDED column
    // aliased earlier in the same select.
    val codes = seqs(Meds.Code)
    val values = seqs(Meds.NumericValue)
    val tdd = seqs("time_delta_days")
    seqs.select(
      seqs(Meds.PatientId),
      least(size(tdd), lit(maxEvents)).as("n_events"),
      padTo(tdd, maxEvents, lit(0.0)).as("time_delta_days"),
      maskTo(tdd, maxEvents).as("event_mask"),
      transform(sequence(lit(1), lit(maxEvents)),
        e => padTo(coalesce(try_element_at(codes, e), array().cast("array<long>")), m, lit(0L))
      ).as(Meds.Code),
      transform(sequence(lit(1), lit(maxEvents)),
        e => maskTo(coalesce(try_element_at(codes, e), array().cast("array<long>")), m)
      ).as("code_mask"),
      transform(sequence(lit(1), lit(maxEvents)),
        e => padTo(coalesce(try_element_at(values, e), array().cast("array<double>")), m, lit(0.0))
      ).as(Meds.NumericValue),
      transform(sequence(lit(1), lit(maxEvents)),
        e => transform(sequence(lit(1), lit(m)),
          i => try_element_at(coalesce(try_element_at(values, e), array().cast("array<double>")), i).isNotNull)
      ).as("numeric_value_mask")
    )
  }

  /** Smallest integral Spark type that can represent vocab indices in
    * [0, maxIndex] (reference: utils.py:19-57 get_smallest_valid_uint_type;
    * Spark has no unsigned types, so the signed type one notch wider is
    * used where the reference picks uint8/16/32).
    */
  def narrowestIndexType(maxIndex: Long): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    if (maxIndex <= Byte.MaxValue) ByteType
    else if (maxIndex <= Short.MaxValue) ShortType
    else if (maxIndex <= Int.MaxValue) IntegerType
    else LongType
  }

  /** Downcast the dense code tensor to the narrowest type that holds the
    * vocabulary (tensorization.py stores codes at the smallest valid uint
    * width — at 100 TB the code tensor dominates output bytes, so 8-bit
    * vs 64-bit indices is an 8x storage/IO difference).
    */
  def withNarrowedCodes(dense: DataFrame, vocabSize: Long): DataFrame = {
    val t = narrowestIndexType(vocabSize)
    dense.withColumn(Meds.Code, col(Meds.Code).cast(s"array<array<${t.simpleString}>>"))
  }

  /** Static (per-patient, time-independent) codes/values from
    * [[Tokenize.staticsAndSchema]] dense-encoded the same way.
    */
  def staticsToDense(statics: DataFrame, maxStatic: Int): DataFrame =
    statics.select(
      statics(Meds.PatientId),
      padTo(statics(Meds.Code), maxStatic, lit(0L)).as("static_code"),
      padTo(statics(Meds.NumericValue), maxStatic, lit(0.0)).as("static_numeric_value"),
      maskTo(statics(Meds.Code), maxStatic).as("static_mask")
    )
}
