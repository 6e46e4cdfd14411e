package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking: split long documents into fixed-token windows
  * with overlap — how corpora feed fixed-context models (and the
  * inverse of [[graft.pipeline.Packing]], which concatenates SHORT
  * docs up to a budget).
  *
  * Row-local throughout: tokenize once into a projected column, derive
  * the chunk count arithmetically, explode chunk indices, slice. No
  * shuffle at all — chunking is embarrassingly parallel, and the output
  * carries (id, chunk_seq) so downstream packing/shuffling can
  * re-localize a document's chunks when order matters.
  *
  * Chunk k covers token positions [k·stride + 1, k·stride + chunkTokens]
  * (stride = chunkTokens − overlapTokens); the last chunk may be short.
  * nChunks = 1 for docs at or under the window, else
  * ceil((L − chunkTokens) / stride) + 1 — integer arithmetic, identical
  * in any engine. Docs with zero tokens emit no chunks.
  */
object Chunker {

  def chunkByTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlapTokens: Int = 0
  ): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "need 0 <= overlapTokens < chunkTokens")
    val stride = chunkTokens - overlapTokens
    docs
      .withColumn("__ts", graft.text.TextFunctions.wordTokens(col(textCol))) // native kernel
      .withColumn("__len", size(col("__ts")).cast("long"))
      .filter(col("__len") > 0)
      .withColumn("__nchunks",
        when(col("__len") <= chunkTokens, lit(1L))
          .otherwise(expr(s"(__len - $chunkTokens + $stride - 1) div $stride") + 1L))
      .withColumn("chunk_seq", explode(sequence(lit(0L), col("__nchunks") - 1L)))
      .select(
        col(idCol),
        col("chunk_seq"),
        array_join(
          slice(col("__ts"), (col("chunk_seq") * stride + 1).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(col("__len") - col("chunk_seq") * stride, lit(chunkTokens.toLong)).as("n_tokens"))
  }
}
