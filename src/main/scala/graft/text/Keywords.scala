package graft.text

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
      .localCheckpoint(true)
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
}
