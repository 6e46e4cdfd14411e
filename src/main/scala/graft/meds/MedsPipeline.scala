package graft.meds

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's full preprocessing pipeline as one composed runner —
  * the stage sequence its hydra configs wire together
  * (reference: README.md pipeline description + MEDS_transforms stage
  * modules): filter patients → add time-derived measurements → fit
  * per-code statistics → occlude outliers → re-fit statistics on the
  * occluded values → fit vocabulary → normalize → tokenize.
  *
  * Each stage is the library's oracle-tested operator; this module only
  * sequences them. Where the reference runs a map/reduce per stage with
  * files in between, the composition here is ONE lazy plan until the
  * caller materializes — Catalyst sees the whole chain, so column
  * pruning and filter ordering cross stage boundaries, and the cohort's
  * single hash(patient_id) exchange is reused by every patient-keyed
  * stage downstream.
  */
object MedsPipeline {

  final case class Config(
      minMeasurementsPerPatient: Option[Long] = None,
      minEventsPerPatient: Option[Long] = None,
      timeDerived: Seq[TimeDerived.TimeDerivedConfig] = Nil,
      minPatientsPerCode: Option[Long] = None,
      minOccurrencesPerCode: Option[Long] = None,
      stddevCutoff: Option[Double] = None,
      codeModifiers: Seq[String] = Nil
  )

  final case class Result(
      data: DataFrame,        // normalized MEDS rows (vocab-indexed codes)
      codeMetadata: DataFrame, // post-occlusion per-code stats + vocab index
      tokenized: DataFrame    // per-(patient, time) event sequences
  )

  /** Run the preprocessing chain over a MEDS measurement frame
    * (patient_id, time, code, numeric_value). Stage order follows the
    * reference: patient-level filters first (they shrink everything
    * downstream), generated measurements before statistics (so AGE etc.
    * are normalized like any other code), occlusion before the FINAL
    * statistics fit (normalization must standardize the post-occlusion
    * distribution).
    */
  def run(meds: DataFrame, config: Config = Config()): Result = {
    val filtered0 = config.minMeasurementsPerPatient
      .map(Filters.filterPatientsByNumMeasurements(meds, _)).getOrElse(meds)
    val filtered = config.minEventsPerPatient
      .map(Filters.filterPatientsByNumEvents(filtered0, _)).getOrElse(filtered0)

    val withDerived =
      if (config.timeDerived.isEmpty) filtered
      else TimeDerived.addTimeDerivedMeasurements(filtered, config.timeDerived)

    val meta0 = CodeMetadata.aggregate(withDerived, codeModifiers = config.codeModifiers)
    val codeFiltered =
      if (config.minPatientsPerCode.isEmpty && config.minOccurrencesPerCode.isEmpty) withDerived
      else Filters.filterMeasurements(withDerived, meta0,
        config.minPatientsPerCode, config.minOccurrencesPerCode, config.codeModifiers)

    val occluded = config.stddevCutoff match {
      case Some(cutoff) =>
        Outliers.occludeOutliers(codeFiltered, meta0, cutoff, config.codeModifiers)
          .drop("numeric_value/is_inlier")
      case None => codeFiltered
    }

    // statistics refit on the post-occlusion values, then vocabulary
    val metaFinal = Vocabulary.lexicographicIndices(
      CodeMetadata.aggregate(occluded, codeModifiers = config.codeModifiers),
      config.codeModifiers)
    val normalized = Normalize.normalize(occluded, metaFinal, config.codeModifiers)
    val tokenized = Tokenize.seqOfPatientEvents(normalized)

    Result(normalized, metaFinal, tokenized)
  }
}
