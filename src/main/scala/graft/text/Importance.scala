package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance weighting for data selection (DSIR-style): score each
  * document by the log-likelihood ratio of its tokens under a TARGET
  * unigram distribution vs the CORPUS distribution — "rank the crawl
  * by how much it looks like the high-quality target slice". Documents
  * with positive mean log-ratio are target-like; resampling by these
  * weights shifts the training mix toward the target domain.
  *
  * Both distributions come from ONE corpus scan: a (term, n_corpus,
  * n_target) count table — the target is a predicate over the same
  * rows, so its counts are a conditional aggregate, not a second scan.
  * The table is vocabulary-sized; totals derive from it; the per-term
  * log-ratio broadcasts back onto the exploded corpus, and per-doc
  * scores are one more doc-keyed partial aggregate. Laplace (+1 over
  * the shared vocabulary) smoothing keeps target-unseen terms finite.
  *
  * Scoring re-tokenizes the corpus (second scan) — inherent: the first
  * pass must finish to know the distributions.
  */
object Importance {

  /** (id, n_tokens, llr): per-doc mean log P_target(w)/P_corpus(w) over
    * its tokens. `targetPred` marks the target slice (e.g. curated
    * source, high quality score). Token-less docs are dropped (no
    * evidence either way). DECIMAL(38,12) term sums — exact,
    * partitioning-independent, engine-portable.
    */
  def importanceScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), targetPred.as("t"),
        explode(TextFunctions.wordTokens(col(textCol))).as("term"))

    val counts = toks
      .groupBy("term")
      .agg(count(lit(1)).as("nc"), count(when(col("t"), lit(1))).as("nt"))

    // totals + vocab size: a 1-row frame derived from the vocab table
    val totals = counts.agg(
      sum(col("nc")).as("tc"), sum(col("nt")).as("tt"), count(lit(1)).as("v"))

    val ratio = counts.crossJoin(broadcast(totals)).select(
      col("term"),
      (ln((col("nt") + 1).cast("double") / (col("tt") + col("v")).cast("double")) -
        ln((col("nc") + 1).cast("double") / (col("tc") + col("v")).cast("double"))).as("lr"))

    toks
      .join(broadcast(ratio), "term")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("lr").cast("decimal(38,12)")).cast("double") /
          count(lit(1)).cast("double")).as("llr"))
  }

  /** (id, n_tokens, entropy): per-doc Shannon entropy (nats) of its own
    * word distribution — a repetitiveness/diversity signal (low entropy
    * = few words dominate; boilerplate and spam score low). Shape:
    * explode → (id, term) count partial-agg → per-doc fold; the only
    * data crossing exchanges is (id, term) pairs and per-doc rows.
    */
  def wordEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), explode(TextFunctions.wordTokens(col(textCol))).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("n"))
      .groupBy("id")
      .agg(
        sum(col("n")).as("n_tokens"),
        sum((col("n") * ln(col("n").cast("double"))).cast("decimal(38,12)"))
          .cast("double").as("snln"))
      // H = ln(N) - (Σ n·ln n)/N  — one pass, no second join for N
      .select(col("id"), col("n_tokens"),
        (ln(col("n_tokens").cast("double")) -
          col("snln") / col("n_tokens").cast("double")).as("entropy"))
}
