package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skip-gram co-occurrence counts — the GloVe/word2vec statistics table:
  * how often two words appear within `window` positions of each other,
  * symmetric (pairs canonicalized (least, greatest)). [[Collocations]]
  * covers the adjacent-bigram PMI case; the windowed count matrix is
  * what embedding trainers and "related terms" features consume.
  *
  * Shape: pair generation is entirely ROW-LOCAL (a nested transform over
  * positions × offsets on the BOUND token array — no self-join of the
  * corpus on position), so the only shuffle is the final (a, b) count
  * aggregate, which partial-aggregates map-side; `minCount` prunes the
  * hapax tail before anything is returned. Pair volume per doc is
  * n·window — linear in corpus size for a fixed window.
  */
object Cooccurrence {

  /** (a, b, n) with a <= b, n >= minCount. Docs below 2 tokens
    * contribute nothing.
    */
  def skipgramCounts(
      docs: DataFrame,
      textCol: String = "text",
      window: Int = 2,
      minCount: Long = 3): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val toks = col("__toks")
    docs
      .select(TextFunctions.wordTokens(col(textCol)).as("__toks"))
      .filter(size(toks) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(1), size(toks) - 1),
        i => transform(
          sequence(lit(1), least(lit(window), size(toks) - i)),
          d => struct(
            least(element_at(toks, i), element_at(toks, i + d)).as("a"),
            greatest(element_at(toks, i), element_at(toks, i + d)).as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }
}
