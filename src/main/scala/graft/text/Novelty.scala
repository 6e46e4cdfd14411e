package graft.text

import graft.plans.Materialize.PinOps
import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document n-gram novelty: what fraction of a document's distinct
  * shingles appear NOWHERE else in the corpus. The complement of the
  * dedup family — near-dups score ~0, template/boilerplate pages score
  * low, genuinely original text scores high — and a common selection
  * signal for "keep the most novel k% per source".
  *
  * Scale shape: one shingle pass (the same hashed 8-byte shingle table
  * [[Dedup.shingleHashTable]] the dedup operators share — never raw
  * strings across the wire), one groupBy(sh) for corpus document
  * frequency, one equi-join back, one groupBy(id). Both groupBys
  * partial-aggregate, so a boilerplate shingle repeated a billion times
  * crosses each exchange once per map partition. The shingle table
  * feeds two consumers (the df aggregate and the join), so it is
  * materialized once (persist to disk on a cluster) rather than
  * re-deriving the tokenization twice.
  */
object Novelty {

  /** (id, n_shingles, n_unique, novelty = n_unique/n_shingles) per
    * document with ≥ 1 shingle. `novelty` is raw (round for
    * cross-engine comparison).
    */
  def noveltyScore(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 5
  ): DataFrame = {
    // repartition BY sh before pinning: shingleHashTable is now a
    // zero-shuffle projection, so an un-repartitioned pin would capture
    // the scan's parallelism (one partition per smallish file) and both
    // consumers would start serial. Hashing on sh gives the pinned frame
    // a layout BOTH consumers reuse — the df groupBy needs no exchange
    // and the sh-join is co-partitioned, so this single exchange replaces
    // the two the old (id,sh)-distinct layout forced downstream.
    val sh = Dedup.shingleHashTable(docs, idCol, textCol, n)
      .repartition(col("sh")).pin(true)
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    sh.join(df, "sh")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col("id"), col("n_shingles"), col("n_unique"),
        (col("n_unique").cast("double") / col("n_shingles")).as("novelty"))
  }
}
