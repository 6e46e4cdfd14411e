package graft.text

import graft.plans.Materialize.PinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level collocation mining: pointwise mutual information over
  * adjacent token pairs — the signal behind "new york"-style phrase
  * vocabularies for tokenizers and n-gram feature selection.
  *
  * PMI(a,b) = ln( P(ab) / (P(a)·P(b)) ) with P(ab) over bigram slots
  * and P(a) over token slots. Shape: two projected scans of the text
  * column (unigram and bigram counts, both map-side combined to
  * vocab-sized tables), then vocab-sized broadcast joins and a
  * broadcast single-row totals frame — the fact table is never
  * shuffled, same pattern as TF-IDF's corpus-size row. `minCount`
  * drops the low-frequency tail whose PMI estimates are noise (and
  * whose pair table is most of the bytes).
  */
object Collocations {

  private def tokArray(textCol: String) =
    graft.text.TextFunctions.wordTokens(col(textCol)) // native kernel, same fields

  /** (a, b, c_ab, pmi) for bigrams seen ≥ `minCount` times. The PMI
    * arithmetic is ordered deterministically (counts are exact longs;
    * one double expression both engines evaluate identically).
    */
  def bigramPmi(docs: DataFrame, textCol: String, minCount: Long = 2L): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val toks = tokArray(textCol)
    // localCheckpoint: each vocab-sized count table feeds several
    // consumers (two join sides / the totals row); without it column
    // pruning would re-run the corpus scan per consumer.
    val uni = docs
      .select(explode(toks).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .pin(false)
    val biAll = docs
      .select(toks.as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(slice(ts, 1, size(ts) - 1), (x, i) -> struct(x as a, ts[i + 1] as b))")).as("bg"))
      .select(col("bg.a"), col("bg.b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .pin(false)
    // P(ab) normalizes over ALL bigram slots (pre-filter), P(a)/P(b)
    // over all token slots.
    val totals = uni.agg(sum(col("c")).as("n_uni"))
      .crossJoin(biAll.agg(sum(col("c_ab")).as("n_bi")))
    biAll
      .filter(col("c_ab") >= minCount)
      .join(broadcast(uni.select(col("t").as("a"), col("c").as("c_a"))), "a")
      .join(broadcast(uni.select(col("t").as("b"), col("c").as("c_b"))), "b")
      .crossJoin(broadcast(totals))
      .select(
        col("a"), col("b"), col("c_ab"),
        round(log(
          (col("c_ab").cast("double") * col("n_uni") * col("n_uni")) /
            (col("c_a").cast("double") * col("c_b") * col("n_bi"))), 6).as("pmi"))
  }
}
