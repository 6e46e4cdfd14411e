package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential pattern support — which short ordered event sequences
  * (A→B, A→B→C) actually recur across users. [[Transitions]] gives the
  * one-step Markov matrix (where do you go NEXT); this surfaces the
  * multi-step motifs with their support, the input to funnel DESIGN
  * (pick the paths worth instrumenting) where [[Funnel]] measures a
  * path someone already chose.
  *
  * Consecutive-only (PrefixSpan's gap-0 specialization): patterns are
  * adjacent steps in each user's time-ordered stream, so extraction is
  * two `lead` windows over ONE user-keyed exchange — no candidate
  * generation, no self-joins, no a-priori lattice. At 100 TB that is
  * the same partition-and-sort every sessionization already pays.
  * Support counts are per-USER (a user repeating a loop 1 000× counts
  * once toward support) next to raw occurrence counts; `minSupport`
  * prunes on users.
  */
object Sequences {

  /** (pattern, len, n_users, n_occurrences) for every consecutive
    * 2-step and 3-step event-type sequence with per-user support ≥
    * `minSupport`. Ordering ties on `tsCol` break by `tieCol` so the
    * extracted sequences are deterministic under any partitioning.
    * Steps join with '>' (step values must not contain it — enforced).
    */
  def sequentialPatterns(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String,
      minSupport: Long = 2L): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val step = when(col(typeCol).contains(">"),
      raise_error(concat(lit("sequentialPatterns: step value contains the " +
        "'>' joiner, pattern strings would be ambiguous: "), col(typeCol))))
      .otherwise(col(typeCol))
    val seq2 = lead(step, 1).over(w)
    val seq3 = lead(step, 2).over(w)
    events
      .filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol).as("__u"), step.as("__a"), seq2.as("__b"), seq3.as("__c"))
      .select(col("__u"), explode(array(
        when(col("__b").isNotNull,
          struct(lit(2L).as("len"), concat_ws(">", col("__a"), col("__b")).as("pattern"))),
        when(col("__c").isNotNull,
          struct(lit(3L).as("len"),
            concat_ws(">", col("__a"), col("__b"), col("__c")).as("pattern")))
      )).as("__p"))
      .filter(col("__p").isNotNull)
      .groupBy(col("__p.pattern").as("pattern"), col("__p.len").as("len"))
      .agg(
        countDistinct(col("__u")).as("n_users"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_users") >= minSupport)
  }
}
