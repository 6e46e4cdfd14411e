package graft.text

import graft.plans.Materialize.PinOps
import graft.text.TextFunctions.wordTokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distinctive-term extraction: which terms are over-represented in a
  * group relative to the whole corpus — the "what is this source/
  * language/cluster actually about" analysis (and a cheap topic-leak
  * detector when the groups are train/eval splits).
  *
  * lift(g, t) = P(t | g) / P(t): > 1 means the group uses the term more
  * than the corpus does. One corpus-sized shuffle — the (group, term)
  * count table — and every marginal (per-group totals, per-term totals,
  * corpus total) is derived FROM that vocab-sized table, not by
  * re-scanning the corpus; they ride broadcast joins back on.
  */
object Keywords {

  /** (group, term, n, lift) for terms with in-group count ≥ `minCount`
    * (the tail is noise and vocabulary-sized output is the point).
    * Lift is computed in doubles; callers round for cross-engine
    * comparison.
    */
  def termLift(
      docs: DataFrame,
      groupCol: String,
      textCol: String = "text",
      minCount: Long = 10L
  ): DataFrame = {
    // materialize the one corpus pass: four consumers below would
    // otherwise each re-run the explode+groupBy (the repo's standing
    // double-evaluation trap); the table is vocab-sized, so the
    // checkpoint is cheap
    val lt = docs
      .select(col(groupCol).as("group"), explode(wordTokens(col(textCol))).as("term"))
      .groupBy("group", "term")
      .agg(count(lit(1)).as("n"))
      .pin(true)
    val perGroup = lt.groupBy("group").agg(sum(col("n")).as("__ng"))
    val perTerm = lt.groupBy("term").agg(sum(col("n")).as("__nt"))
    val total = lt.agg(sum(col("n")).as("__nn"))
    lt
      .join(broadcast(perGroup), "group")
      .join(broadcast(perTerm), "term")
      .crossJoin(broadcast(total))
      .filter(col("n") >= minCount)
      .select(
        col("group"), col("term"), col("n"),
        ((col("n").cast("double") / col("__ng").cast("double")) /
          (col("__nt").cast("double") / col("__nn").cast("double"))).as("lift"))
  }

  /** Per-group KL divergence from the corpus unigram distribution:
    * KL(P_g ‖ P) = Σ_t P_g(t) · ln(P_g(t) / P(t)) — the scalar "how far
    * has this slice drifted from the whole" signal (source skew, split
    * leakage, crawl-batch drift). Zero-count terms contribute nothing
    * (0·ln0 = 0 by continuity), and P(t) > 0 whenever P_g(t) > 0 since
    * the corpus contains the group, so the sum is always finite.
    *
    * Same execution shape as [[termLift]]: the (group, term) table is
    * the one corpus pass; the divergence is a vocab-sized aggregation
    * over it, with sums in DECIMAL(38,12) so the reduction order cannot
    * wiggle low bits across engines or partitionings.
    */
  def groupDivergence(
      docs: DataFrame,
      groupCol: String,
      textCol: String = "text"
  ): DataFrame = {
    val lt = docs
      .select(col(groupCol).as("group"), explode(wordTokens(col(textCol))).as("term"))
      .groupBy("group", "term")
      .agg(count(lit(1)).as("n"))
      .pin(true)
    val perGroup = lt.groupBy("group").agg(sum(col("n")).as("__ng"))
    val perTerm = lt.groupBy("term").agg(sum(col("n")).as("__nt"))
    val total = lt.agg(sum(col("n")).as("__nn"))
    val pg = col("n").cast("double") / col("__ng").cast("double")
    val p = col("__nt").cast("double") / col("__nn").cast("double")
    lt
      .join(broadcast(perGroup), "group")
      .join(broadcast(perTerm), "term")
      .crossJoin(broadcast(total))
      .select(col("group"), (pg * log(pg / p)).cast("decimal(38,12)").as("__kl"))
      .groupBy("group")
      .agg(sum(col("__kl")).cast("double").as("kl"))
  }
}
