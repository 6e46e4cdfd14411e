package graft

import graft.meds.ConfigPipeline
import org.apache.spark.sql.functions._

/** End-to-end spec for the spark-submit entry point: `graft.Main` on the
  * checked-in example config must reproduce the oracle-verified
  * q_meds_pipeline / q_pipeline_config result from (yaml, inDir, outDir)
  * alone — the reference's console-script deployment mode
  * (pyproject.toml:31-54) collapsed to one submit.
  */
class MainSpec extends SparkSpec {

  private val configPath = "configs/preprocess_example.yaml"
  private val inDir = "/root/testdata/sf0.001"

  test("Main on the example YAML reproduces the oracle-verified pipeline output") {
    val out = java.nio.file.Files.createTempDirectory("graft-main").toString
    val yaml = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(configPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    // Main.main would getOrCreate the suite's session; call the typed
    // entry it delegates to, then check the WRITTEN artifacts.
    val state = Main.run(spark, yaml, inDir, out)
    assert(state.meta.isDefined, "fit stages must populate metadata")

    def proj(df: org.apache.spark.sql.DataFrame) =
      df.select(col("patient_id"), unix_micros(col("time")).as("t"), col("code"),
        graft.functions.Portable.r6(col("numeric_value")).as("v"))
    val written = proj(spark.read.parquet(s"$out/data"))
    val direct = proj(ConfigPipeline.run(Main.readMeds(spark, inDir), yaml).data)
    assert(written.count() > 0)
    assert(written.exceptAll(direct).isEmpty && direct.exceptAll(written).isEmpty,
      "written data/ must equal the in-process ConfigPipeline result")

    val meta = spark.read.parquet(s"$out/metadata")
    assert(meta.count() > 0 && meta.columns.contains("code"))
    assert(!new java.io.File(s"$out/tokenized").exists(),
      "no tokenization stage configured -> no tokenized/ output")
  }

  test("readMeds falls back to MEDS-shaped parquet when no events.parquet exists") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-meds-in").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "HR", 61.0))
      .toDF("patient_id", "time", "code", "numeric_value")
      .write.mode("overwrite").parquet(dir)
    val got = Main.readMeds(spark, dir)
    assert(got.columns.sorted.toSeq == Seq("code", "numeric_value", "patient_id", "time"))
    assert(got.count() == 1)
  }

  test("main() rejects bad usage loudly") {
    val ex = intercept[RuntimeException](Main.main(Array("only-one-arg")))
    assert(ex.getMessage.contains("usage"))
  }
}
