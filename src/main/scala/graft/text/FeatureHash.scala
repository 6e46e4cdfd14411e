package graft.text

import graft.text.TextFunctions.md5Hash32
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The hashing trick: project each document's bag of words into a fixed
  * `dim`-dimensional sparse vector with NO vocabulary pass — bucket =
  * hash(term) mod dim, sign = an independent hash bit (signed hashing:
  * colliding terms cancel in expectation instead of biasing counts up).
  * The feature step for linear quality classifiers / DSIR over hashed
  * n-grams, and the only featurizer that needs zero global state —
  * which is what makes it the 100 TB default.
  *
  * Shape: explode → (id, bucket) partial-aggregating groupBy. One
  * shuffle carrying at most min(tokens, dim) rows per doc; no
  * vocabulary table, no broadcast, no driver state.
  */
object FeatureHash {

  /** (id, bucket, w): signed hashed term frequencies. Buckets whose
    * signed counts cancel to exactly 0 are kept (they're real features
    * of the doc, and dropping them would make output depend on
    * collision layout more than it already does).
    */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim > 1, s"dim must be > 1, got $dim")
    val h = md5Hash32(col("term"))
    // bucket from the low bits, sign from the next bit up — independent
    // enough for 32 md5 bits, identical integer math in any engine.
    val bucket = pmod(h, lit(dim.toLong))
    val sign = (pmod((h / dim).cast("long"), lit(2L)) * 2 - 1).cast("long")
    docs
      .select(col(idCol).as("id"), explode(TextFunctions.wordTokens(col(textCol))).as("term"))
      .select(col("id"), bucket.as("bucket"), sign.as("s"))
      .groupBy("id", "bucket")
      .agg(sum(col("s")).as("w"))
  }
}
