package graft.sources

import graft.meds.Meds
import graft.operators.Shard
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MEDS cohort I/O in the reference's sharded layout.
  *
  * The reference materializes each pipeline stage as
  * `<stage>/<split>/<shard>.parquet` (reference:
  * src/MEDS_transforms/extract/split_and_shard_patients.py +
  * merge_to_MEDS_cohort.py write pattern). graft maps that to Spark's
  * native partitioned-parquet layout `<root>/split=<s>/shard=<n>/...`:
  *   - partition pruning gives free split/shard selection on read
  *     (`spark.read...filter('split === "train")` never touches other
  *     directories);
  *   - each (split, shard) holds whole patients (shard = hash of
  *     patient_id), so per-patient operators downstream can run
  *     shard-parallel without cross-shard shuffles, exactly like the
  *     reference's map stage;
  *   - within each shard, rows are sorted by (patient_id, time) — the
  *     MEDS on-disk contract.
  */
object MedsIO {

  /** Write a MEDS measurement table in sharded layout.
    *
    * @param splitAssignment (patient_id, split, shard) from
    *   [[Shard.splitAndShardPatients]] / [[Shard.splitByModulo]]; it is
    *   patient-count sized (a "vocabulary" table relative to measurements)
    *   and therefore broadcast onto the fact table.
    */
  def writeSharded(df: DataFrame, splitAssignment: DataFrame, path: String): Unit =
    df.join(broadcast(splitAssignment), Seq(Meds.PatientId))
      .repartition(col("split"), col("shard"), col(Meds.PatientId))
      .sortWithinPartitions(col("split"), col("shard"), col(Meds.PatientId), col(Meds.Time))
      .write
      .mode("overwrite")
      .partitionBy("split", "shard")
      .parquet(path)

  /** Read a sharded cohort back; `split`/`shard` become ordinary columns
    * recovered from the directory names, and split/shard predicates prune
    * partitions at planning time.
    */
  def readSharded(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Identity of an extracted dataset, serialized to `metadata/dataset.json`
    * (reference: extract/finalize_MEDS_metadata.py:117-123 key set).
    */
  final case class DatasetInfo(
      datasetName: String,
      datasetVersion: String,
      etlName: String = "graft",
      etlVersion: String = "0.1.0",
      medsVersion: String = "0.3.2"
  )

  /** Write the final MEDS metadata artifacts
    * (finalize_MEDS_metadata.py:110-156):
    *   - `metadata/codes.parquet`: schema-finalized code metadata
    *     (vocabulary-sized -> one file);
    *   - `metadata/dataset.json`: dataset_name/version + etl name/version +
    *     meds_version;
    *   - `metadata/patient_splits.parquet`: (patient_id: long, split:
    *     string). Patient-count sized — NOT coalesced to one file (at 100 TB
    *     that's hundreds of millions of rows; the reference's single-file
    *     layout is an artifact of single-node Polars, not a contract worth a
    *     1-task bottleneck).
    */
  def writeMetadata(
      codeMetadata: DataFrame,
      patientSplits: DataFrame,
      info: DatasetInfo,
      path: String
  ): Unit = {
    val spark = codeMetadata.sparkSession
    val metaDir = s"$path/metadata"
    Meds.finalizeMetadata(codeMetadata)
      .coalesce(1).write.mode("overwrite").parquet(s"$metaDir/codes.parquet")
    patientSplits
      .select(col(Meds.PatientId).cast("long").as(Meds.PatientId), col("split").cast("string").as("split"))
      .write.mode("overwrite").parquet(s"$metaDir/patient_splits.parquet")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    val json =
      s"""{"dataset_name": "${esc(info.datasetName)}", "dataset_version": "${esc(info.datasetVersion)}", "etl_name": "${esc(info.etlName)}", "etl_version": "${esc(info.etlVersion)}", "meds_version": "${esc(info.medsVersion)}"}"""
    // Hadoop FS API so the sink works on any cluster filesystem, not just local
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(metaDir), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$metaDir/dataset.json"), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Ingest row-chunking (reference: extract/shard_events.py — split raw
    * input into ~`rowsPerShard`-row chunks so downstream map stages get
    * bounded units of work).
    *
    * In Spark the chunk is an output FILE: the writer's `maxRecordsPerFile`
    * option rolls files at the row bound inside each write task. This costs
    * ZERO extra scans and ZERO shuffles — the count + repartition(ceil(n /
    * rowsPerShard)) formulation would add one full scan (the count) and one
    * full round-robin shuffle, both pure overhead at 100 TB.
    */
  def writeRowChunked(df: DataFrame, path: String, rowsPerShard: Long): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", rowsPerShard)
      .parquet(path)
}
