package graft.text

import graft.text.TextFunctions.wordTokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document corpus.
  *
  * Shuffle budget at corpus scale: one groupBy (doc, term) for term
  * frequencies, one groupBy (term) for document frequencies (vocabulary-
  * sized output), one equi-join on term to attach idf. The corpus size N
  * rides along as a broadcast single-row frame — no driver-side count
  * action, the whole thing stays one lazy plan.
  */
object Tfidf {

  /** Per-(doc, term) frequency table: (id, term, tf). */
  def termFrequencies(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("id"), explode(wordTokens(col(textCol))).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"))

  /** (id, term, tf, tfidf) with the smooth idf variant
    * `idf = ln((N + 1) / (df + 1)) + 1` (df = #docs containing the term),
    * which never divides by zero and keeps corpus-wide terms at weight ~1.
    */
  def tfidf(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf
      .join(docFreq, "term")
      .crossJoin(broadcast(n))
      .select(
        col("id"),
        col("term"),
        col("tf"),
        (col("tf") * (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1)).as("tfidf")
      )
  }
}
