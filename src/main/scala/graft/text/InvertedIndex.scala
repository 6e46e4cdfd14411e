package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction: bounded per-term posting lists, the
  * materialized form of what [[Bm25]] computes on the fly — build once,
  * serve retrieval from the index.
  *
  * Shape: ONE corpus-sized shuffle (the (term, doc) tf aggregation,
  * map-side combined), then term-partitioned windows rank postings —
  * df and rank share the single term-keyed exchange. Posting lists are
  * BOUNDED three ways, because unbounded lists are how inverted indexes
  * die at 100 TB:
  *   - `maxDf` drops stopword-grade terms whole (their postings are
  *     useless for retrieval and hold most of the index's bytes);
  *   - `minDf` drops hapax noise;
  *   - `k` caps each surviving list at the top-k docs by tf
  *     (impact-ordered truncation, deterministic via doc-id tie-break).
  *
  * The term windows sort only each term's own postings (≤ maxDf rows
  * by construction once the df filter applies) — no global sort, no
  * single-partition window.
  */
object InvertedIndex {

  /** Exploded bounded postings: (term, df, doc_id, tf, rk). */
  def postings(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minDf: Long = 1L,
      maxDf: Long = Long.MaxValue
  ): DataFrame = {
    require(k > 0, "k must be positive")
    require(minDf >= 1 && maxDf >= minDf, "need 1 <= minDf <= maxDf")
    val tf = docs
      .select(
        col(idCol).as("doc_id"),
        explode(graft.text.TextFunctions.wordTokens(col(textCol))).as("term")) // native kernel
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
    val byTerm = Window.partitionBy("term")
    val ranked = tf
      .withColumn("df", count(lit(1)).over(byTerm))
      .filter(col("df").between(minDf, maxDf))
      .withColumn(
        "rk",
        row_number().over(byTerm.orderBy(col("tf").desc, col("doc_id"))).cast("long"))
      .filter(col("rk") <= k)
    ranked.select(col("term"), col("df"), col("doc_id"), col("tf"), col("rk"))
  }
}
