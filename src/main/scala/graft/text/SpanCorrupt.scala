package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic T5-style span corruption — the denoising-objective
  * preprocessing step: mask random token spans and collapse each masked
  * run to ONE sentinel, so the model learns to reconstruct spans from
  * context. "Random" here is a per-(doc, position) md5 coin, so the
  * corruption is reproducible across runs, partitionings, and engines —
  * the same determinism-from-hashing contract as every sampler in this
  * repo (a seeded RNG would tie the output to iteration order).
  *
  * A span STARTS at position p when `h32(id:p) % rate == 0` (expected
  * mask fraction ≈ spanLen/rate before overlap) and covers `spanLen`
  * tokens; overlapping spans merge into one run, runs collapse to a
  * single `<mask>` sentinel.
  *
  * Shape: entirely ROW-LOCAL — three staged projections (tokens →
  * start flags → merged mask flags → corrupted sequence), every HOF
  * lambda reading BOUND columns only (the interpreted-HOF discipline);
  * zero shuffle, fuses into the scan.
  */
object SpanCorrupt {

  private val Sentinel = "<mask>"

  /** (id, n_tokens, n_masked, n_spans, corrupt_fp): span/mask counts
    * plus the md5 fingerprint of the corrupted sequence (sentinel runs
    * collapsed), which downstream exact-dedup can key on. Zero-token
    * docs report zeros with the empty-string fingerprint.
    */
  def corruptionStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      spanLen: Int = 3,
      rate: Int = 8): DataFrame = {
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    require(rate >= 2, s"rate must be >= 2, got $rate")
    val toks = col("__toks")
    val starts = col("__starts")
    val masked = col("__m")
    def startAt(id: Column, i: Column): Column =
      TextFunctions.md5Hash32(
        concat(id.cast("string"), lit(":"), i.cast("string"))) % rate === 0
    // guarded lookback OR over the spanLen-1 previous start flags
    def maskAt(i: Column): Column =
      (0 until spanLen).map { k =>
        if (k == 0) element_at(starts, i)
        else i > k && element_at(starts, i - k)
      }.reduce(_ || _)
    docs
      .select(col(idCol).as("id"), TextFunctions.wordTokens(col(textCol)).as("__toks"))
      .select(col("id"), toks,
        when(size(toks) === 0, array().cast("array<boolean>"))
          .otherwise(transform(sequence(lit(1), size(toks)),
            i => startAt(col("id"), i))).as("__starts"))
      .select(col("id"), toks,
        when(size(toks) === 0, array().cast("array<boolean>"))
          .otherwise(transform(sequence(lit(1), size(toks)),
            i => maskAt(i))).as("__m"))
      .select(col("id"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(masked, m => m)).cast("long").as("n_masked"),
        when(size(toks) === 0, array().cast("array<string>"))
          .otherwise(filter(
            transform(sequence(lit(1), size(toks)), i =>
              when(!element_at(masked, i), element_at(toks, i))
                .when(i === 1 || !element_at(masked, i - 1), lit(Sentinel))
                .otherwise(lit(null).cast("string"))),
            t => t.isNotNull)).as("__kept"))
      .select(col("id"), col("n_tokens"), col("n_masked"),
        size(filter(col("__kept"), t => t === Sentinel)).cast("long").as("n_spans"),
        md5(concat_ws(" ", col("__kept"))).as("corrupt_fp"))
  }
}
