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

  /** Join-key skew audit: BEFORE shipping a 100 TB shuffle, ask whether
    * one key will own a task. One groupBy to the per-key count frame,
    * then a `topK`-row report: each heavy key with its count and share,
    * plus the table-level facts repeated on every row — total rows,
    * distinct keys, max/avg skew ratio, and the [[saltedJoin]] `salts`
    * value that would level the hottest key down to an average-sized
    * task (`ceil(max/avg)`, the number a capacity reviewer actually
    * wants). Rows tie-break by key so the report is deterministic.
    *
    * The key is emitted as a string (`key`) so audits over columns of
    * any type union cleanly into one report.
    */
  def keySkewAudit(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val summary = counts.agg(
      sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("n")).as("max_n"))
    val avg = col("n_rows").cast("double") / col("n_keys").cast("double")
    counts
      .orderBy(col("n").desc, col("key"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("key"))))
      .crossJoin(broadcast(summary))
      .select(
        lit(keyCol).as("key_col"), col("rank"), col("key"), col("n"),
        (col("n").cast("double") / col("n_rows").cast("double")).as("share"),
        col("n_rows"), col("n_keys"),
        (col("max_n").cast("double") / avg).as("skew"),
        ceil(col("max_n").cast("double") / avg).cast("long").as("salts"))
  }
}
