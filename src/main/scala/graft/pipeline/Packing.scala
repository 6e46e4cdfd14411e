package graft.pipeline

import graft.text.TextFunctions.md5Hash32
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget bins (context
  * windows / training batches) deterministically at corpus scale.
  */
object Packing {

  /** Block packing by running token count: documents are hash-sharded
    * (deterministic md5, so shard membership survives re-runs), ordered by
    * id within their shard, and a document opens in the bin where the
    * token count of everything BEFORE it lands: `bin = floor(prefix_sum /
    * budget)`.
    *
    * Semantics trade: a document straddling a budget boundary overflows
    * its bin — each bin's total is < `budgetTokens` + the largest single
    * document — in exchange for the whole assignment being ONE partitioned
    * window (prefix sum) with no sequential state. Exact next-fit packing
    * (reset the counter at each new bin) is inherently sequential per
    * shard; at 100 TB the bounded-overflow block form is the one that
    * parallelizes, and the shard count caps each window partition's size.
    *
    * Output: input columns + `shard`, `bin` (both long). Bins are unique
    * per (shard, bin).
    *
    * Token counts are clamped to >= 1 for the prefix sum: a zero-token
    * document must still advance the running count, otherwise every
    * zero-token document in a shard lands in the SAME bin and that bin's
    * membership is unbounded (the degenerate-key hazard the dedup
    * pipelines guard with bounded collects). The clamp bounds every bin
    * at <= `budgetTokens` members regardless of input.
    */
  def packByTokenBudget(
      docs: DataFrame,
      idCol: String,
      tokenCountCol: String,
      budgetTokens: Long,
      nShards: Int
  ): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window
      .partitionBy(col("shard"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("shard", pmod(md5Hash32(col(idCol).cast("string")), lit(nShards.toLong)))
      .withColumn(
        "bin",
        (coalesce(sum(greatest(col(tokenCountCol), lit(1L))).over(w), lit(0L)) / budgetTokens).cast("long"))
  }

  /** Materialize the packed batches: one row per (shard, bin) with the
    * member documents' text concatenated in id order around `separator`
    * (the end-of-document token), plus the member ids and the bin's token
    * total — the frame a training-data exporter writes out. Documents
    * within a bin are few by construction (budget / typical doc length),
    * so the per-bin collect is bounded by the same budget that defines
    * the bin.
    */
  def materializePacks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tokenCountCol: String,
      budgetTokens: Long,
      nShards: Int,
      separator: String = "<|eod|>"
  ): DataFrame =
    packByTokenBudget(docs, idCol, tokenCountCol, budgetTokens, nShards)
      .groupBy("shard", "bin")
      .agg(
        sort_array(collect_list(struct(col(idCol), col(textCol)))).as("__m"),
        sum(col(tokenCountCol)).as("n_tokens")
      )
      .select(
        col("shard"),
        col("bin"),
        col(s"__m.$idCol").as("doc_ids"),
        array_join(col(s"__m.$textCol"), separator).as("text"),
        col("n_tokens")
      )

  /** Length-bucketed PADDED-batch assembly: sort sequences by length
    * within each partition key and cut consecutive runs of `batchSize`
    * — the standard padding minimizer for models that batch-pad to the
    * max (where [[packByTokenBudget]] concatenates for packed training,
    * this GROUPS for padded training; random batching pads every batch
    * to its longest straggler and wastes ~30-50% of compute on filler).
    * Emits the per-batch efficiency report: `pad_frac` = 1 − Σlen /
    * (n·max_len), the exact fraction of padded positions.
    *
    * One window per partition key (length order, id tie-break —
    * deterministic batches), then a batch-sized aggregation. The
    * partition key is the caller's sharding unit (source, shard id);
    * batches never cross it, so the window never sees more than one
    * shard's rows.
    *
    * Output: (by, batch, n, min_len, max_len, sum_len, pad_frac).
    */
  def lengthBucketBatches(
      df: DataFrame,
      byCol: String,
      idCol: String,
      lenCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val len = col(lenCol).cast("long")
    // window over the POST-rename columns (the pre-rename names are gone)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("by")).orderBy(col("len"), col("id"))
    val withBatch = df
      .filter(len.isNotNull && col(idCol).isNotNull)
      .select(col(byCol).as("by"), col(idCol).as("id"), len.as("len"))
      .withColumn("batch",
        floor((row_number().over(w) - 1).cast("double") / batchSize.toDouble).cast("long"))
    withBatch
      .groupBy(col("by"), col("batch"))
      .agg(
        count(lit(1)).as("n"),
        min(col("len")).as("min_len"),
        max(col("len")).as("max_len"),
        sum(col("len")).as("sum_len"))
      .withColumn("pad_frac",
        when(col("max_len") > 0L,
          lit(1.0) - col("sum_len").cast("double") /
            (col("n").cast("double") * col("max_len").cast("double"))).otherwise(lit(0.0)))
  }
}
