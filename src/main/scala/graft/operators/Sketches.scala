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

  // ------------------------------------------------------------ count-min

  /** Count-min sketch as a relational frame: `depth` independent
    * md5-derived hash rows × `width` buckets of ADDITIVE counts —
    * (j, b, n). Partial-aggregates map-side to at most depth×width rows
    * per partition, and two sketch tables MERGE by summing matching
    * cells (the CDC/federated increment property [[mergeSketchPartials]]
    * has for distinct counts, here for frequencies). Estimates
    * overcount, never undercount.
    *
    * Unlike HLL's binary blobs this sketch is pure integer arithmetic on
    * md5, so any engine reproduces it bit-for-bit — the estimate itself
    * is oracle-verifiable.
    */
  def countMinTable(df: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch dims $depth x $width")
    df.select(col(itemCol).cast("string").as("i"))
      .filter(col("i").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"), col("i"))
      .groupBy(col("j"),
        pmod(graft.text.TextFunctions.md5Hash32(concat_ws("#", col("j"), col("i"))),
          lit(width.toLong)).as("b"))
      .agg(count(lit(1)).as("n"))
  }

  /** Merge count-min partials built with the SAME (depth, width): cells
    * add. */
  def countMinMerge(partials: DataFrame): DataFrame =
    partials.groupBy("j", "b").agg(sum(col("n")).as("n"))

  /** Point-estimate the frequency of each row's `itemCol`: min over the
    * sketch's depth rows of the item's bucket count. The sketch is
    * depth×width — always broadcast; the probe side never shuffles.
    */
  def countMinEstimate(sketch: DataFrame, items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame =
    items
      .select(col(itemCol).cast("string").as("i")).distinct()
      .select(col("i"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("b",
        pmod(graft.text.TextFunctions.md5Hash32(concat_ws("#", col("j"), col("i"))),
          lit(width.toLong)))
      .join(broadcast(sketch), Seq("j", "b"), "left")
      .groupBy("i")
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
}
