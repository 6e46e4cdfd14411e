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
    * @param numericValue optional numeric column (lenient cast to double)
    * @param timeFormat optional list of timestamp formats (Spark
    *                   DateTimeFormatter patterns) tried IN ORDER against a
    *                   string `time` column — the first that parses wins
    *                   (convert_to_sharded_events.py:28-31, 422-433:
    *                   `pl.coalesce(strptime(fmt, strict=False) for fmt in
    *                   ts_format)`). None ⇒ plain timestamp cast.
    * @param textValue  optional column emitted as `text_value` (string cast;
    *                   convert_to_sharded_events.py:476-478)
    * @param categoricalValue optional column emitted as `categorical_value`
    *                   (string cast; convert_to_sharded_events.py:479-481)
    * @param dedup      drop duplicate output rows, the reference's trailing
    *                   `.unique()` (convert_to_sharded_events.py:500). Spark
    *                   has no maintain_order and MEDS order is re-established
    *                   by the (patient, time) sort downstream, so this is a
    *                   plain distinct. Disable when a row-unique column (an
    *                   event id) makes it a pure extra shuffle.
    */
  final case class EventConfig(
      patientId: String,
      time: Option[String],
      code: Seq[CodePart],
      numericValue: Option[String] = None,
      timeFormat: Option[Seq[String]] = None,
      textValue: Option[String] = None,
      categoricalValue: Option[String] = None,
      extraCols: Map[String, String] = Map.empty,
      dedup: Boolean = false
  )
  sealed trait CodePart
  final case class CodeLit(value: String) extends CodePart
  final case class CodeCol(name: String) extends CodePart

  /** Build MEDS rows from a raw table per `cfg`
    * (convert_to_sharded_events.py:101-503: code assembled by joining
    * literal/column parts with "//", null columns -> "UNK"; time parsed via
    * the format list or cast; numeric_value cast with lenient semantics).
    *
    * Row filters, matching the reference:
    *   - when the FIRST code part is a column, rows where it is null are
    *     dropped (get_code_expr's null filter, :87-91 — only the first
    *     part, by doctest contract);
    *   - when `time` is a column, rows whose time is null AFTER parsing are
    *     dropped (:428-443 `ts_filter_expr`) — with a format list this
    *     silently discards unparseable strings, like strptime(strict=False).
    */
  def extractEvent(raw: DataFrame, cfg: EventConfig): DataFrame = {
    val codeExpr: Column = concat_ws(
      "//",
      cfg.code.map {
        case CodeLit(v) => lit(v)
        case CodeCol(c) => coalesce(col(c).cast("string"), lit("UNK"))
      }: _*
    )
    val timeExpr: Column = cfg.time match {
      case None => lit(null).cast("timestamp")
      case Some(t) =>
        cfg.timeFormat match {
          case Some(fmts) =>
            require(fmts.nonEmpty, "timeFormat list must not be empty")
            coalesce(fmts.map(f => try_to_timestamp(col(t), lit(f))): _*)
          case None => col(t).cast("timestamp")
        }
    }
    val base = Seq(
      col(cfg.patientId).cast("long").as(Meds.PatientId),
      timeExpr.as(Meds.Time),
      codeExpr.as(Meds.Code),
      cfg.numericValue.map(v => col(v).cast("double")).getOrElse(lit(null).cast("double"))
        .as(Meds.NumericValue)
    )
    val values = cfg.textValue.map(c => col(c).cast("string").as("text_value")).toSeq ++
      cfg.categoricalValue.map(c => col(c).cast("string").as("categorical_value")).toSeq
    val extras = cfg.extraCols.toSeq.sortBy(_._1).map { case (out, in) => col(in).as(out) }
    val codeFiltered = cfg.code.headOption match {
      case Some(CodeCol(c)) => raw.filter(col(c).isNotNull)
      case _                => raw
    }
    val selected = codeFiltered.select(base ++ values ++ extras: _*)
    val timeFiltered =
      if (cfg.time.isDefined) selected.filter(col(Meds.Time).isNotNull) else selected
    if (cfg.dedup) timeFiltered.dropDuplicates() else timeFiltered
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

  /** Combine code metadata from SEVERAL sources (one per event config /
    * vocabulary file) into one table with a single row per code.
    *
    * Reference: extract_code_metadata.py:191-241 (per-config extraction,
    * diagonal concat + unique) and :404-426 (reducer: when a code appears
    * in more than one source, `description` values are concatenated with
    * `cfg.stage_cfg.description_separator` and `parent_codes` lists are
    * flattened; other metadata columns are collected into lists).
    *
    * Determinism: the reference concatenates in frame order
    * (maintain_order). Distributed input has no frame order, so graft
    * sorts within each group before concatenating/flattening —
    * deterministic under any partitioning. Unlike the reference, the
    * output schema does not depend on whether collisions exist (Polars
    * wraps in lists only when n_unique != n_rows); graft always applies
    * the aggregated shape.
    *
    * All tables here are vocabulary-sized; one groupBy on codes.
    */
  def extractCodeMetadataMulti(
      sources: Seq[DataFrame],
      joinCols: Seq[String] = Seq(Meds.Code),
      descriptionSeparator: String = "; "
  ): DataFrame = {
    require(sources.nonEmpty, "extractCodeMetadataMulti needs at least one source")
    val allCols = sources.flatMap(_.columns).distinct
    val aligned = sources.map { s =>
      val padded = allCols.foldLeft(s) { (acc, c) =>
        if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null))
      }
      padded.select(allCols.map(col): _*)
    }
    val unioned = aligned.reduce(_.unionByName(_)).dropDuplicates()
    val metaCols = allCols.filterNot(joinCols.contains)
    val aggs = metaCols.map {
      case "description" =>
        when(count(col("description")) > 0,
          concat_ws(descriptionSeparator, sort_array(collect_list(col("description")))))
          .as("description")
      case "parent_codes" =>
        sort_array(flatten(collect_list(col("parent_codes")))).as("parent_codes")
      case c =>
        sort_array(collect_list(col(c))).as(c)
    }
    unioned.groupBy(joinCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
