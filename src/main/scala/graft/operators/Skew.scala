package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * AQE's skew-join handling (on by default) splits oversized partitions of
  * sort-merge joins at runtime and covers most cases. This explicit salt
  * is for the case AQE cannot fix: a single join KEY so hot that one task
  * would still own it after splitting (e.g. the "UNK" code after a lossy
  * mapping, a null-surrogate patient, a boilerplate document fingerprint).
  *
  * The skewed (probe) side gets a deterministic salt in [0, salts); the
  * build side is replicated once per salt value. The join key becomes
  * (key, salt), spreading each hot key over `salts` tasks. Replication
  * multiplies the build side — use only when the build side is
  * dimension-sized, which is exactly the metadata-join shape every MEDS
  * operator here has.
  */
object Skew {

  def saltedJoin(
      skewed: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // Deterministic salt: hash of the whole probe row, so re-runs place
    // rows identically (important for reproducible debugging at scale).
    val probe = skewed.withColumn(
      "__salt", pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(salts)))
    val replicated = build.withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    probe.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
