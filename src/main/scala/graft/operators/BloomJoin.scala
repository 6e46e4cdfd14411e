package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter pre-filtered semi join: when the build side is too big
  * to broadcast as an exact hash table but its KEY SET still sketches
  * into a few hundred MB, ship a Bloom filter of the keys and drop
  * non-matching fact rows BEFORE the join shuffle — the manual twin of
  * Spark's own runtime row-level filtering, exposed as an operator so a
  * pipeline can apply it across stage boundaries (e.g. filter a 100 TB
  * fact table against last month's key set before a merge join).
  *
  * The Bloom filter admits false positives, so the pre-filter is ALWAYS
  * followed by the exact join — results are bit-identical to the plain
  * join (the oracle IS the plain semi join, like [[Skew.saltedJoin]]'s
  * parity contract); the sketch only reduces how many rows reach the
  * shuffle. With fpp 1% the filter costs ~9.6 bits per key: 10^9 keys ≈
  * 1.2 GB — sized for torrents the broadcast-hash-join path refuses.
  *
  * Build cost is one pass over the build side's keys (driver-merged
  * partial sketches via `DataFrameStatFunctions.bloomFilter`); the fact
  * side is never shuffled for the pre-filter itself.
  */
object BloomJoin {

  /** `fact` rows whose `factKey` might be in `build`'s `buildKey` set —
    * a superset of the true semi join (fpp-bounded overshoot).
    */
  def bloomFilterRows(
      fact: DataFrame,
      build: DataFrame,
      factKey: String,
      buildKey: String,
      expectedKeys: Long,
      fpp: Double = 0.01
  ): DataFrame = {
    require(expectedKeys > 0, "expectedKeys must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0,1)")
    // the probe path hashes LONGS (mightContainLong); a string build key
    // would be hashed as bytes by stat.bloomFilter and never match the
    // long-hashed probes — true matches silently dropped. Integral keys
    // only, checked loudly here.
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    for ((df, c) <- Seq((fact, factKey), (build, buildKey))) {
      val dt = df.schema(c).dataType
      require(integral.contains(dt),
        s"BloomJoin requires an integral key; '$c' is ${dt.sql} — hash it to a long first")
    }
    val bf: BloomFilter = build.stat.bloomFilter(col(buildKey).cast("long"), expectedKeys, fpp)
    val bcast = fact.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) => k != null && bcast.value.mightContainLong(k))
    fact.filter(col(factKey).isNotNull && mightContain(col(factKey)))
  }

  /** Exact left-semi join with the Bloom pre-filter in front: same rows
    * as `fact.join(build, fact(factKey) === build(buildKey), "left_semi")`,
    * with only sketch-surviving rows entering the join shuffle.
    */
  def semiJoin(
      fact: DataFrame,
      build: DataFrame,
      factKey: String,
      buildKey: String,
      expectedKeys: Long,
      fpp: Double = 0.01
  ): DataFrame = {
    val pre = bloomFilterRows(fact, build, factKey, buildKey, expectedKeys, fpp)
    pre.join(build.select(col(buildKey).as(factKey)).distinct(), Seq(factKey), "left_semi")
  }
}
