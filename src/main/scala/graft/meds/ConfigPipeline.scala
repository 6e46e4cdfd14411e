package graft.meds

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.operators._
import org.apache.spark.sql.DataFrame

import scala.jdk.CollectionConverters._

/** Declarative, config-file-driven pipeline composition — the reference's
  * user interface (reference: pipeline_configuration.md; configs/
  * preprocess.yaml `stages:` list; configs/stage_configs/&#42;.yaml per-stage
  * blocks). A user ports a reference pipeline by editing a config, not
  * Scala: the YAML/JSON document names an ordered `stages` list, each
  * stage optionally configured by a same-named block under
  * `stage_configs` (keys match the reference's snake_case).
  *
  * Where the reference materializes every stage to parquet shards with a
  * mapreduce runner between them, this interpreter threads TWO lazy
  * frames through the fold — the DATA frame and the current code-METADATA
  * frame (the reference's `codes.parquet`) — so Catalyst sees the whole
  * composed chain as one plan per output, exactly like the code-composed
  * [[MedsPipeline.run]]. Fit stages (`preliminary_counts`,
  * `fit_outlier_detection`, `fit_normalization`) re-aggregate the current
  * data into the metadata slot; transform stages consume it via
  * vocabulary-sized broadcast joins.
  *
  * Supported stage names (reference: configs/stage_configs/):
  *   - `filter_patients` {min_events_per_patient, min_measurements_per_patient}
  *   - `add_time_derived_measurements` {age {DOB_code|dob_from_first_event,
  *     age_code, age_unit}, time_of_day {time_of_day_code, endpoints}}
  *   - `preliminary_counts` / `count_code_occurrences`
  *     {aggregations, do_summarize_over_all_codes}
  *   - `filter_measurements` {min_patients_per_code, min_occurrences_per_code}
  *   - `fit_outlier_detection` {}
  *   - `occlude_outliers` {stddev_cutoff, drop_is_inlier}
  *   - `fit_normalization` {}
  *   - `fit_vocabulary_indices` {}
  *   - `normalization` {}
  *   - `reorder_measurements` {ordered_code_patterns}
  *   - `tokenization` {}
  * Top-level `code_modifiers` applies to every code-keyed stage.
  */
object ConfigPipeline {

  /** One parser handles both YAML (the reference's format) and JSON
    * (YAML 1.2 is a JSON superset; jackson-dataformat-yaml ships with
    * Spark).
    */
  private val mapper = new ObjectMapper(new YAMLFactory())

  final case class Parsed(
      stages: Seq[String],
      stageConfigs: Map[String, JsonNode],
      codeModifiers: Seq[String]
  )

  def parse(configText: String): Parsed = {
    val root = mapper.readTree(configText)
    val stagesNode = root.get("stages")
    require(stagesNode != null && stagesNode.isArray && stagesNode.size() > 0,
      "pipeline config needs a non-empty `stages` array")
    val stages = stagesNode.elements().asScala.map(_.asText()).toSeq
    val sc = Option(root.get("stage_configs"))
      .map(n => n.properties().asScala.map(e => e.getKey -> e.getValue).toMap)
      .getOrElse(Map.empty)
    val mods = Option(root.get("code_modifiers")).filter(_.isArray)
      .map(_.elements().asScala.map(_.asText()).toSeq)
      .getOrElse(Nil)
    Parsed(stages, sc, mods)
  }

  /** Per-stage defaults registry mirroring the reference's
    * `configs/stage_configs/&#42;.yaml` composition model (one defaults file
    * per stage, user config carries only overrides): each known stage
    * loads its defaults from the `graft/stage_configs/&lt;stage&gt;.yaml`
    * classpath resource; the user's same-named `stage_configs` block
    * deep-merges ON TOP — nested objects merge recursively, scalars and
    * arrays replace, and an explicit `null` unsets a default (the
    * reference's Hydra `~key` idiom).
    */
  def stageDefaults(stage: String): JsonNode = {
    val in = getClass.getResourceAsStream(s"/graft/stage_configs/$stage.yaml")
    if (in == null) empty
    else
      try Option(mapper.readTree(in).get(stage)).getOrElse(empty)
      finally in.close()
  }

  private def deepMerge(defaults: JsonNode, overrides: JsonNode): JsonNode =
    if (!defaults.isObject || !overrides.isObject) overrides
    else {
      val merged = defaults.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      overrides.properties().asScala.foreach { e =>
        val (k, v) = (e.getKey, e.getValue)
        if (merged.has(k) && merged.get(k).isObject && v.isObject)
          merged.set[JsonNode](k, deepMerge(merged.get(k), v))
        else merged.set[JsonNode](k, v)
      }
      merged
    }

  /** The effective config for `stage`: registry defaults under the user's
    * overrides.
    */
  def effectiveConfig(stage: String, userBlock: JsonNode): JsonNode =
    deepMerge(stageDefaults(stage), userBlock)

  private def optLong(n: JsonNode, key: String): Option[Long] =
    Option(n.get(key)).filterNot(_.isNull).map(_.asLong())
  private def optDouble(n: JsonNode, key: String): Option[Double] =
    Option(n.get(key)).filterNot(_.isNull).map(_.asDouble())
  private def optText(n: JsonNode, key: String): Option[String] =
    Option(n.get(key)).filterNot(_.isNull).map(_.asText())
  private def optSeq(n: JsonNode, key: String): Option[Seq[JsonNode]] =
    Option(n.get(key)).filter(_.isArray).map(_.elements().asScala.toSeq)
  private val empty: JsonNode = mapper.createObjectNode()

  private def timeDerivedConfigs(n: JsonNode): Seq[TimeDerived.TimeDerivedConfig] = {
    val age = Option(n.get("age")).filterNot(_.isNull).map { a =>
      val dob: DataFrame => org.apache.spark.sql.Column =
        optText(a, "DOB_code") match {
          case Some(code) => TimeDerived.dobFromCode(code)
          // graft extension for cohorts without explicit birth events
          case None => TimeDerived.dobFromFirstEvent
        }
      TimeDerived.AgeConfig(dob,
        optText(a, "age_code").getOrElse("AGE"),
        optText(a, "age_unit").getOrElse("years"))
    }
    val tod = Option(n.get("time_of_day")).filterNot(_.isNull).map { t =>
      TimeDerived.TimeOfDayConfig(
        optSeq(t, "endpoints").map(_.map(_.asInt())).getOrElse(Seq(6, 12, 18)),
        optText(t, "time_of_day_code").getOrElse("time_of_day"))
    }
    (age.toSeq ++ tod.toSeq)
  }

  final case class State(
      data: DataFrame,
      meta: Option[DataFrame],
      tokenized: Option[DataFrame]
  )

  /** Run the configured stage list over a MEDS measurement frame. */
  def run(meds: DataFrame, configText: String): State = {
    val cfg = parse(configText)
    val mods = cfg.codeModifiers

    def metaOrFit(st: State): DataFrame =
      st.meta.getOrElse(CodeMetadata.aggregate(st.data, codeModifiers = mods))

    cfg.stages.foldLeft(State(meds, None, None)) { (st, stage) =>
      val c = effectiveConfig(stage, cfg.stageConfigs.getOrElse(stage, empty))
      stage match {
        case "filter_patients" =>
          val d1 = optLong(c, "min_measurements_per_patient")
            .map(Filters.filterPatientsByNumMeasurements(st.data, _)).getOrElse(st.data)
          val d2 = optLong(c, "min_events_per_patient")
            .map(Filters.filterPatientsByNumEvents(d1, _)).getOrElse(d1)
          st.copy(data = d2)

        case "add_time_derived_measurements" =>
          val gens = timeDerivedConfigs(c)
          require(gens.nonEmpty, s"stage `$stage` configured with no generators")
          st.copy(data = TimeDerived.addTimeDerivedMeasurements(st.data, gens))

        case "preliminary_counts" | "count_code_occurrences" =>
          val aggs = optSeq(c, "aggregations").map(_.map(_.asText()))
            .getOrElse(CodeMetadata.aggregationNames)
          val overAll = Option(c.get("do_summarize_over_all_codes")).exists(_.asBoolean(false))
          st.copy(meta = Some(CodeMetadata.aggregate(st.data, aggs, mods, overAll)))

        case "filter_measurements" =>
          st.copy(data = Filters.filterMeasurements(st.data, metaOrFit(st),
            optLong(c, "min_patients_per_code"),
            optLong(c, "min_occurrences_per_code"), mods))

        case "fit_outlier_detection" | "fit_normalization" =>
          val aggs = optSeq(c, "aggregations").map(_.map(_.asText()))
            .getOrElse(CodeMetadata.aggregationNames)
          st.copy(meta = Some(CodeMetadata.aggregate(st.data, aggs, codeModifiers = mods)))

        case "occlude_outliers" =>
          val cutoff = optDouble(c, "stddev_cutoff").getOrElse(4.5)
          val occluded = Outliers.occludeOutliers(st.data, metaOrFit(st), cutoff, mods)
          val dropFlag = Option(c.get("drop_is_inlier")).exists(_.asBoolean(false))
          st.copy(data = if (dropFlag) occluded.drop("numeric_value/is_inlier") else occluded)

        case "fit_vocabulary_indices" =>
          st.copy(meta = Some(Vocabulary.lexicographicIndices(metaOrFit(st), mods)))

        case "normalization" =>
          st.copy(data = Normalize.normalize(st.data, metaOrFit(st), mods))

        case "reorder_measurements" =>
          val patterns = optSeq(c, "ordered_code_patterns").map(_.map(_.asText())).getOrElse(Nil)
          st.copy(data = Reorder.reorderMeasurements(st.data, metaOrFit(st), patterns, mods))

        case "tokenization" =>
          st.copy(tokenized = Some(Tokenize.seqOfPatientEvents(st.data)))

        case other =>
          throw new IllegalArgumentException(
            s"unknown pipeline stage `$other`; known: filter_patients, " +
              "add_time_derived_measurements, preliminary_counts, " +
              "count_code_occurrences, filter_measurements, fit_outlier_detection, " +
              "occlude_outliers, fit_normalization, fit_vocabulary_indices, " +
              "normalization, reorder_measurements, tokenization")
      }
    }
  }
}
