package graft

import graft.meds.{ConfigPipeline, MedsPipeline}
import graft.operators.TimeDerived
import org.apache.spark.sql.functions._

/** The declarative stage-list runner must reproduce the code-composed
  * pipeline exactly — a user ports a reference pipeline by editing the
  * YAML, never Scala.
  */
class ConfigPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val meds = graft.meds.Meds.fromEvents(
    graft.sources.Tables.events(spark, "/root/testdata/sf0.001"))

  test("the checked-in example YAML reproduces MedsPipeline.run bit-for-bit") {
    val yaml = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("configs/preprocess_example.yaml")),
      java.nio.charset.StandardCharsets.UTF_8)
    val fromConfig = ConfigPipeline.run(meds, yaml).data
      .select(col("patient_id"), unix_micros(col("time")).as("t"), col("code"),
        graft.functions.Portable.r6(col("numeric_value")).as("v"))
    val fromCode = MedsPipeline.run(meds, MedsPipeline.Config(
        minMeasurementsPerPatient = Some(60),
        timeDerived = Seq(
          TimeDerived.AgeConfig(TimeDerived.dobFromFirstEvent, "AGE", "yrs"),
          TimeDerived.TimeOfDayConfig()),
        stddevCutoff = Some(3.0)))
      .data
      .select(col("patient_id"), unix_micros(col("time")).as("t"), col("code"),
        graft.functions.Portable.r6(col("numeric_value")).as("v"))
    assert(fromConfig.count() > 0)
    assert(fromConfig.exceptAll(fromCode).isEmpty && fromCode.exceptAll(fromConfig).isEmpty)
  }

  test("JSON works too (YAML superset), stages compose left to right") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "HR", 60.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-02 01:00:00"), "HR", 80.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-03 01:00:00"), "RARE", 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "HR", 70.0)
    ).toDF("patient_id", "time", "code", "numeric_value")
    val out = ConfigPipeline.run(df,
      """{"stages": ["count_code_occurrences", "filter_measurements"],
        | "stage_configs": {
        |   "count_code_occurrences": {"do_summarize_over_all_codes": false},
        |   "filter_measurements": {"min_occurrences_per_code": 2}}}""".stripMargin)
    assert(out.data.select("code").distinct().as[String].collect().toSet == Set("HR"))
    assert(out.meta.isDefined)
  }

  test("tokenization stage populates the tokenized slot") {
    val out = ConfigPipeline.run(meds.limit(500),
      "stages:\n  - fit_vocabulary_indices\n  - normalization\n  - tokenization\n")
    assert(out.tokenized.isDefined)
    assert(out.tokenized.get.count() > 0)
  }

  test("unknown stages fail loudly with the known-stage list") {
    val e = intercept[IllegalArgumentException] {
      ConfigPipeline.run(meds, "stages:\n  - not_a_stage\n")
    }
    assert(e.getMessage.contains("not_a_stage") && e.getMessage.contains("filter_patients"))
  }

  test("a config without stages is rejected") {
    intercept[IllegalArgumentException] {
      ConfigPipeline.run(meds, "stage_configs: {}\n")
    }
  }

  // --- stage-config defaults registry --------------------------------------

  test("effectiveConfig: registry defaults under user overrides, nulls unset") {
    val d = ConfigPipeline.stageDefaults("add_time_derived_measurements")
    assert(d.get("age").get("DOB_code").asText() == "MEDS_BIRTH")
    assert(d.get("time_of_day").get("time_of_day_code").asText() == "TIME_OF_DAY")
    assert(ConfigPipeline.stageDefaults("occlude_outliers").get("stddev_cutoff").asDouble() == 4.5)

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val user = mapper.readTree(
      "age:\n  DOB_code: null\n  age_unit: \"yrs\"\ntime_of_day:\n  endpoints: [6, 18]\n")
    val eff = ConfigPipeline.effectiveConfig("add_time_derived_measurements", user)
    // nested merge: untouched defaults survive, overrides land, null unsets
    assert(eff.get("age").get("DOB_code").isNull)
    assert(eff.get("age").get("age_unit").asText() == "yrs")
    assert(eff.get("age").get("age_code").asText() == "AGE")
    assert(eff.get("time_of_day").get("time_of_day_code").asText() == "TIME_OF_DAY")
    // arrays replace, not merge
    assert(eff.get("time_of_day").get("endpoints").size() == 2)
  }

  test("an unconfigured occlude_outliers stage uses the registry's 4.5 cutoff") {
    val fromConfig = ConfigPipeline.run(meds,
      "stages:\n  - fit_outlier_detection\n  - occlude_outliers\n").data
    val direct = graft.operators.Outliers.occludeOutliers(
      meds, graft.operators.CodeMetadata.aggregate(meds), stddevCutoff = 4.5)
    assert(fromConfig.filter(col("numeric_value/is_inlier") === false).count() ==
      direct.filter(col("numeric_value/is_inlier") === false).count())
    assert(fromConfig.filter(col("numeric_value/is_inlier") === false).count() > 0)
  }

  test("the registry's MEDS_BIRTH default anchors ages at the birth event") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2000-01-01 00:00:00"), "MEDS_BIRTH", null.asInstanceOf[java.lang.Double]),
      (1L, java.sql.Timestamp.valueOf("2010-01-01 12:00:00"), "HR", java.lang.Double.valueOf(60.0))
    ).toDF("patient_id", "time", "code", "numeric_value")
    val out = ConfigPipeline.run(df, "stages:\n  - add_time_derived_measurements\n").data
    val ages = out.filter(col("code") === "AGE").select("numeric_value").as[Double].collect()
    assert(ages.length == 1 && math.abs(ages(0) - 10.0) < 0.01, s"got ${ages.toSeq}")
    // the default TIME_OF_DAY generator ran too, with the reference's code
    assert(out.filter(col("code").startsWith("TIME_OF_DAY//")).count() == 2)
  }

  test("without a birth event the MEDS_BIRTH default yields no age rows (no crash)") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2010-01-01 12:00:00"), "HR", java.lang.Double.valueOf(60.0))
    ).toDF("patient_id", "time", "code", "numeric_value")
    val out = ConfigPipeline.run(df, "stages:\n  - add_time_derived_measurements\n").data
    assert(out.filter(col("code") === "AGE").count() == 0)
  }
}
