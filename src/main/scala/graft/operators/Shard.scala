package graft.operators

import graft.meds.Meds
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Patient split & shard assignment, and event-level ingest sharding.
  *
  * Reference: src/MEDS_transforms/extract/split_and_shard_patients.py
  * (seeded random assignment of patients to train/tuning/held_out splits,
  * then fixed-size shards within splits) and extract/shard_events.py
  * (row-chunking raw input files).
  */
object Shard {

  /** Assign each patient a split label from `fractions` (name -> fraction,
    * must sum to ~1) and a shard id within the split.
    *
    * The reference shuffles patient ids with a seeded RNG and slices
    * (split_and_shard_patients.py:16-153). Distributed analog: order
    * patients by a seeded 64-bit hash (xxhash64 — stable across Spark
    * versions and cluster layouts) and slice by cumulative fraction. This
    * keeps assignment deterministic given (seed, patient set) without any
    * driver-side collection; only the vocabulary-of-patients table is
    * windowed, never the measurement table.
    *
    * For oracle-friendly deterministic assignment, `byModulo` below avoids
    * the engine-specific hash entirely.
    */
  def splitAndShardPatients(
      patients: DataFrame,
      fractions: Seq[(String, Double)],
      nShardsPerSplit: Int,
      seed: Long = 1
  ): DataFrame = {
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    import org.apache.spark.sql.expressions.Window
    val n = count(lit(1)).over(Window.partitionBy())
    val rank = row_number().over(
      Window.orderBy(xxhash64(col(Meds.PatientId), lit(seed)), col(Meds.PatientId))
    )
    val frac = (rank.cast("double") - 0.5) / n
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val splitExpr = fractions.zip(cum).foldRight(lit(fractions.last._1)) {
      case (((name, _), hi), acc) => when(frac < hi, lit(name)).otherwise(acc)
    }
    patients
      .select(col(Meds.PatientId)).distinct()
      .withColumn("split", splitExpr)
      .withColumn("shard", pmod(xxhash64(col(Meds.PatientId), lit(seed + 1)), lit(nShardsPerSplit)))
  }

  /** Deterministic modulo-based split assignment (oracle-verifiable across
    * engines): patient_id mod `denom` thresholded by cumulative weights.
    */
  def splitByModulo(
      patients: DataFrame,
      weights: Seq[(String, Int)],
      nShardsPerSplit: Int
  ): DataFrame = {
    val denom = weights.map(_._2).sum
    val m = pmod(col(Meds.PatientId), lit(denom))
    val cum = weights.scanLeft(0)(_ + _._2).tail
    val splitExpr = weights.zip(cum).foldRight(lit(weights.last._1)) {
      case (((name, _), hi), acc) => when(m < hi, lit(name)).otherwise(acc)
    }
    patients
      .select(col(Meds.PatientId)).distinct()
      .withColumn("split", splitExpr)
      .withColumn("shard", pmod(floor(col(Meds.PatientId).cast("double") / denom).cast("long"), lit(nShardsPerSplit)))
  }

  /** Ingest sharding (shard_events.py): split a raw table into ~`rowsPerShard`
    * chunks. In Spark this is just a repartition-by-range write — the
    * "shards" of the reference are Spark's native partitions.
    */
  def shardEvents(df: DataFrame, rowsPerShard: Long): DataFrame = {
    val nRows = df.count()
    val nShards = math.max(1, math.ceil(nRows.toDouble / rowsPerShard).toInt)
    df.repartition(nShards)
  }
}
