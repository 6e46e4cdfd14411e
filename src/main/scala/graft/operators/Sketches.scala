package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built
  * into Spark): the approximate, O(1)-state twin of
  * [[CodeMetadata.mergePartials]]'s exact reducers — for the counts a
  * 100 TB pipeline cannot afford exactly (distinct patients per code
  * across federated sites, distinct documents per shingle across
  * ingest increments).
  *
  * The contract that matters at scale: partials computed per shard /
  * site / day are BINARY columns that union in any topology — merging
  * yesterday's rollup with today's delta estimates within the sketch's
  * error bounds of a one-shot merge over all history, so incremental
  * ingest never re-scans history. (Estimates are NOT bit-identical
  * across merge topologies: sparse→dense mode promotion points differ.
  * Both the topology tolerance and the accuracy-vs-exact bound are
  * spec-pinned. DuckDB's approx_distinct is a different estimator, so
  * `q_hll` ships rows-only rather than oracle-hashed.)
  */
object Sketches {

  /** Per-key sketch partials: (keys..., sketch BINARY). `lgK` trades
    * state (2^lgK bytes-ish) for accuracy (~1.04/√2^lgK).
    */
  def distinctSketchPartials(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      lgK: Int = 12
  ): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Reduce partial sketch tables (patient-disjoint or not — HLL union
    * is idempotent for repeated items) to one sketch per key.
    */
  def mergeSketchPartials(partials: DataFrame, keyCols: Seq[String]): DataFrame =
    partials
      .groupBy(keyCols.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Replace the binary sketch with its distinct-count estimate. */
  def estimate(sketches: DataFrame): DataFrame =
    sketches.withColumn("n_distinct_est", hll_sketch_estimate(col("sketch"))).drop("sketch")
}
