package graft

import graft.meds.{ConfigPipeline, Meds}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark-submit-able pipeline entry point — parity with the reference's
  * deployment UI, where every stage ships as a console script
  * (reference: pyproject.toml:31-54, `MEDS_transform-*` /
  * `MEDS_extract-*` each taking a Hydra config). graft's equivalent is
  * ONE binary running the whole declarative stage list
  * ([[graft.meds.ConfigPipeline]]): where the reference materializes
  * parquet between per-stage processes, this submits the composed chain
  * as a single Catalyst plan per output and writes only the final
  * frames.
  *
  * Usage (cluster):
  * {{{
  * spark-submit --class graft.Main graft.jar \
  *   configs/preprocess_example.yaml /data/meds_input /data/out
  * }}}
  * or locally: `sbt "runMain graft.Main <config.yaml> <in> <out>"`.
  *
  * Input resolution: a directory containing `events.parquet` is read
  * through [[graft.sources.Tables.events]] (the synthetic test layout,
  * TIMESTAMP-NANOS-safe) and adapted via [[Meds.fromEvents]]; any other
  * path is read as an already-MEDS-shaped parquet table
  * (patient_id, time, code, numeric_value).
  *
  * Outputs under `<outDir>`:
  *   - `data/`      — the transformed measurement table (always)
  *   - `metadata/`  — the final code-metadata frame (when a fit/count
  *                    stage ran, the reference's `codes.parquet`)
  *   - `tokenized/` — patient event sequences (when a `tokenization`
  *                    stage ran)
  */
object Main {

  /** Read the pipeline input as a MEDS measurement frame. */
  def readMeds(spark: SparkSession, inDir: String): DataFrame =
    if (new java.io.File(s"$inDir/events.parquet").exists())
      Meds.fromEvents(graft.sources.Tables.events(spark, inDir))
    else spark.read.parquet(inDir)

  /** Run `configText` over the input and write the resulting frames.
    * Returns the final pipeline state (for tests and embedding callers).
    */
  def run(
      spark: SparkSession,
      configText: String,
      inDir: String,
      outDir: String): ConfigPipeline.State = {
    val state = ConfigPipeline.run(readMeds(spark, inDir), configText)
    state.data.write.mode("overwrite").parquet(s"$outDir/data")
    state.meta.foreach(_.write.mode("overwrite").parquet(s"$outDir/metadata"))
    state.tokenized.foreach(_.write.mode("overwrite").parquet(s"$outDir/tokenized"))
    state
  }

  def main(args: Array[String]): Unit = {
    val (configPath, inDir, outDir) = args match {
      case Array(c, i, o) => (c, i, o)
      case _ => sys.error("usage: graft.Main <pipeline-config.yaml> <inDir> <outDir>")
    }
    val configText = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(configPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    // Under spark-submit the master comes from the launcher; standalone
    // runs default to every local core. shuffle.partitions is only a
    // default — a cluster submit overrides it on the command line.
    val builder = SparkSession.builder().appName("graft-pipeline")
    val spark = SessionDefaults.applyTo(
      (if (sys.props.contains("spark.master")) builder
       else builder.master("local[*]")
         .config("spark.sql.shuffle.partitions",
           Runtime.getRuntime.availableProcessors().toString))
        .config("spark.sql.session.timeZone", "UTC"))
        .getOrCreate()
    try {
      val state = run(spark, configText, inDir, outDir)
      // stable one-line summary for scripts wrapping the submit
      println(s"""{"data_rows":${state.data.count()},""" +
        s""""wrote_metadata":${state.meta.nonEmpty},""" +
        s""""wrote_tokenized":${state.tokenized.nonEmpty},"out":"$outDir"}""")
    } finally spark.stop()
  }
}
