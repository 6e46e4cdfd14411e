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
}
