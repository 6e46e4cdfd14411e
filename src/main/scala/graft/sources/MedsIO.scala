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
