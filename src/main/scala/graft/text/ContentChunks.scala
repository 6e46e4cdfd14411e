package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) for text — variable-size block dedup,
  * the rsync/LBFS idea applied to token streams: cut a document wherever
  * the rolling k-gram hash hits `hash % divisor == 0`, so chunk
  * boundaries are determined by CONTENT, not position. Insert one
  * sentence at the top of a boilerplate page and fixed-size blocks all
  * shift (nothing dedups); content-defined cuts re-align immediately and
  * every untouched chunk still matches. Mean chunk length ≈ divisor
  * tokens (+ the k-token window).
  *
  * Sits between line-level dedup (needs exact line boundaries) and
  * span-level substring dedup (per-position shingle join): chunk hashes
  * are a ~1/divisor subsample of positions with exact-match semantics on
  * multi-line blocks.
  *
  * Shape: chunking is entirely ROW-LOCAL (the ordered `ShingleHashes`
  * array supplies the cut mask; chunks are slices of the token array —
  * zero shuffle, fuses into the scan). Every HOF lambda here reads only
  * BOUND column attributes from a previous projection — inlining the
  * token/hash expressions into a lambda would re-evaluate them once per
  * position (the topBigramFraction pitfall; measured as an
  * O(positions × tokens) regex stall at 10x scale). The duplication
  * stats are then the novelty-table pattern: ONE (chunk_hash)
  * partial-agg for document frequency and a join back onto the chunk
  * table — two narrow shuffles of (id, hash) pairs, never text.
  */
object ContentChunks {

  /** Exploded (id, chunk_idx, chunk_hash) table — chunk_idx is the
    * 0-based position of the chunk within its document. A doc with no
    * boundary (or fewer than `k` tokens) is one chunk; zero-token docs
    * have none.
    */
  def chunkTable(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 5,
      divisor: Int = 8): DataFrame = {
    require(k >= 1, s"window size k must be >= 1, got $k")
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    val h = col("__h")
    val toks = col("__toks")
    val bounds = col("__bounds")
    docs
      .select(col(idCol).as("id"), TextFunctions.wordTokens(col(textCol)).as("__toks"))
      .select(col("id"), toks,
        graft.functions.ShingleHashes.shingleHashes(toks, k).as("__h"))
      // cut after the last token of each boundary window; the empty-array
      // guard matters because sequence(1, 0) counts DOWN in Spark (the
      // wordShingles pitfall) and would probe element_at(h, 0)
      .select(col("id"), toks,
        when(size(h) === 0, array().cast("array<int>"))
          .otherwise(transform(
            filter(sequence(lit(1), size(h)),
              i => pmod(element_at(h, i), lit(divisor)) === 0),
            i => i + (k - 1))).as("__cuts"))
      .select(col("id"), toks,
        concat(array(lit(0)), col("__cuts"), array(size(toks))).as("__bounds"))
      .select(col("id"),
        filter(
          transform(
            sequence(lit(1), size(bounds) - 1),
            j => slice(toks, element_at(bounds, j) + 1,
              element_at(bounds, j + 1) - element_at(bounds, j))),
          c => size(c) > 0).as("__chunks"))
      .select(col("id"),
        posexplode(transform(col("__chunks"),
          c => TextFunctions.md5Hash32(concat_ws(" ", c)))))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"), col("col").as("chunk_hash"))
  }

  /** Per-doc chunk duplication report over the doc's DISTINCT chunk
    * hashes: (id, n_chunks, n_dup_chunks, dup_frac) where a chunk is
    * duplicated when the same content hash appears in more than one
    * document (cross-document block reuse — boilerplate headers, quoted
    * blocks, mirrored sections). Chunks repeated within one doc only
    * are not cross-doc duplicates.
    */
  def chunkDupStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 5,
      divisor: Int = 8): DataFrame = {
    import graft.plans.Materialize.PinOps
    // distinct (id, hash) pairs feed BOTH the df aggregate and the join
    val pairs = chunkTable(docs, idCol, textCol, k, divisor)
      .select(col("id"), col("chunk_hash")).distinct()
      .pin(false)
    val df = pairs.groupBy("chunk_hash").agg(count(lit(1)).as("n_docs"))
    pairs
      .join(df, "chunk_hash")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("n_docs") > 1, lit(1))).as("n_dup_chunks"))
      .withColumn("dup_frac",
        col("n_dup_chunks").cast("double") / col("n_chunks").cast("double"))
  }
}
