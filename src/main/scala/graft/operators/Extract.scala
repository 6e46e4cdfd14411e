package graft.operators

import graft.meds.Meds
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Extraction stages: converting raw relational tables into MEDS
  * measurement rows, merging per-source shards into one sorted cohort, and
  * attaching external code metadata.
  *
  * Reference: src/MEDS_transforms/extract/convert_to_sharded_events.py,
  * merge_to_MEDS_cohort.py, extract_code_metadata.py.
  */
object Extract {

  /** Declarative event extraction config, the analog of one entry in the
    * reference's event_conversion_config
    * (convert_to_sharded_events.py:33-101, 101-503):
    *
    * @param patientId  column holding the patient id
    * @param time       timestamp column, or None for static events
    * @param code       literal parts and/or column references joined with
    *                   "//"; column parts are null-filled with "UNK"
    * @param numericValue optional numeric column (cast to double)
    */
  final case class EventConfig(
      patientId: String,
      time: Option[String],
      code: Seq[CodePart],
      numericValue: Option[String] = None,
      extraCols: Map[String, String] = Map.empty
  )
  sealed trait CodePart
  final case class CodeLit(value: String) extends CodePart
  final case class CodeCol(name: String) extends CodePart

  /** Build MEDS rows from a raw table per `cfg`
    * (convert_to_sharded_events.py:101-503: code assembled by joining
    * literal/column parts with "//", null columns -> "UNK"; time cast to
    * timestamp; numeric_value cast with lenient semantics).
    */
  def extractEvent(raw: DataFrame, cfg: EventConfig): DataFrame = {
    val codeExpr: Column = concat_ws(
      "//",
      cfg.code.map {
        case CodeLit(v) => lit(v)
        case CodeCol(c) => coalesce(col(c).cast("string"), lit("UNK"))
      }: _*
    )
    val base = Seq(
      col(cfg.patientId).cast("long").as(Meds.PatientId),
      cfg.time.map(t => col(t).cast("timestamp")).getOrElse(lit(null).cast("timestamp")).as(Meds.Time),
      codeExpr.as(Meds.Code),
      cfg.numericValue.map(v => col(v).cast("double")).getOrElse(lit(null).cast("double"))
        .as(Meds.NumericValue)
    )
    val extras = cfg.extraCols.toSeq.sortBy(_._1).map { case (out, in) => col(in).as(out) }
    raw.select(base ++ extras: _*)
  }

  /** Merge per-source event tables into one cohort, diagonally (union of
    * columns, missing ones null) and sorted by (patient, time, extra...)
    * (merge_to_MEDS_cohort.py:14-198). The sort is realized as a
    * patient-co-partitioned sort — within-patient order is the MEDS
    * contract; a global range sort is unnecessary shuffle pressure at
    * 100 TB.
    */
  def mergeCohort(
      parts: Seq[DataFrame],
      additionalSortBy: Seq[String] = Nil,
      uniqueBy: Option[Seq[String]] = None
  ): DataFrame = {
    require(parts.nonEmpty, "mergeCohort needs at least one input")
    val allCols = parts.flatMap(_.columns).distinct
    val aligned = parts.map { p =>
      val padded = allCols.foldLeft(p) { (acc, c) =>
        if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null))
      }
      padded.select(allCols.map(col): _*)
    }
    val unioned = aligned.reduce(_.unionByName(_))
    val deduped = uniqueBy match {
      case Some(keys) => unioned.dropDuplicates(keys)
      case None       => unioned
    }
    val sortCols = (Seq(Meds.PatientId, Meds.Time) ++ additionalSortBy)
      .filter(allCols.contains).map(col)
    deduped.repartition(col(Meds.PatientId)).sortWithinPartitions(sortCols: _*)
  }

  /** Attach external code metadata (descriptions, parent codes, ...) to the
    * cohort's code table (extract_code_metadata.py): left join on code —
    * metadata is vocabulary-sized, always broadcast.
    */
  def attachCodeMetadata(
      codes: DataFrame,
      metadata: DataFrame,
      joinCols: Seq[String] = Seq(Meds.Code)
  ): DataFrame =
    codes.join(broadcast(metadata), joinCols, "left")
}
