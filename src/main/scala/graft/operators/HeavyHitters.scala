package graft.operators

import graft.functions.FrequentItems.frequentItems
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters in two passes — the classic sketch-then-recount
  * shape for "which items occur ≥ t times" when the item domain is too
  * large to groupBy outright (URLs, shingles, n-grams at corpus scale):
  *
  *   pass 1: Misra–Gries sketch ([[graft.functions.FrequentItems]]) —
  *           each map partition reduces to ≤ k counters before ONE
  *           global merge; the candidate set (≤ k items) provably
  *           contains every item with frequency > N/(k+1);
  *   pass 2: broadcast the candidates, semi-join the corpus (no shuffle
  *           of non-candidate rows — they drop at the scan), exact-count
  *           only the survivors.
  *
  * The output is EXACT and deterministic (unlike the sketch alone,
  * whose survivor set depends on partitioning): every item with count ≥
  * `threshold`, provided `threshold` clears the sketch's miss bound
  * N/(k+1) — checked at runtime against the true N and failed LOUDLY,
  * because a silent recall gap is a wrong answer, not an approximation.
  */
object HeavyHitters {

  /** Merged candidate table (item, weight_lb): ≤ k rows; weights are
    * lower bounds on true frequency, not exact counts.
    */
  def candidates(df: DataFrame, itemCol: String, k: Int): DataFrame =
    df.agg(count(lit(1)).as("__n"), frequentItems(col(itemCol), k).as("__items"))
      .select(col("__n"), explode(col("__items")).as("c"))
      .select(col("__n"), col("c.item").as(itemCol), col("c.weight").as("weight_lb"))

  /** Every item with exact count ≥ `threshold`: (item, n), n exact.
    * Fails loudly when threshold ≤ N/(k+1) (guarantee void — raise k).
    */
  def exactHeavyHitters(df: DataFrame, itemCol: String, k: Int, threshold: Long): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    // Two traps shape this projection. (1) The guard is folded into the
    // JOIN KEY itself — as a separate column it would be pruned away by
    // the semi join and never evaluate. (2) explode_OUTER, not explode:
    // an adversarially flat distribution can leave the merged sketch
    // EMPTY, and a plain explode would then emit zero rows — zero guard
    // evaluations — silently skipping the very case where the bound is
    // most likely violated. The outer null-item row evaluates the guard
    // and, when the bound holds, joins nothing (correctly: an empty
    // sketch under a valid bound means no item reaches the threshold).
    val cand = df
      .agg(count(lit(1)).as("__n"), frequentItems(col(itemCol), k).as("__items"))
      .select(col("__n"), explode_outer(col("__items")).as("c"))
      .select(
        when(lit(threshold) * (k + 1) <= col("__n"),
          raise_error(concat(
            lit(s"exactHeavyHitters: threshold $threshold <= N/(k+1) with k=$k, N="),
            col("__n"), lit(" — candidates may miss true heavy hitters; raise k"))))
          .otherwise(col("c.item")).as(itemCol))
    df.select(col(itemCol))
      .join(broadcast(cand), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }
}
