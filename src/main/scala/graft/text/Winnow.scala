package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): slide a window of `w` consecutive
  * k-gram hashes over the document and keep the minimum hash of each
  * window; the DISTINCT selected values are the document's fingerprints.
  *
  * Guarantee: any two documents sharing a substring of at least
  * `w + k − 1` tokens share at least one fingerprint, while the expected
  * density of selected hashes is only 2/(w+1) — the principled way to
  * subsample shingles for plagiarism / overlap detection instead of
  * keeping all of them (full-shingle pipelines: `Dedup.shingleHashTable`)
  * or a fixed-size sketch that loses locality (minhash).
  *
  * Spark shape: entirely ROW-LOCAL — `ShingleHashes` (native, codegen'd)
  * produces the ordered k-gram hash array in one digest pass, window
  * minima are a `transform` over positions, and the fingerprint set is an
  * `array_distinct`. Zero shuffle; fuses into the scan. The hash array is
  * projected into its OWN column before the window lambda touches it —
  * inlining it would re-run the tokenizer + digest per window position
  * (the topBigramFraction interpreted-HOF pitfall). The optional exploded
  * (id, fingerprint) table feeds the same df-capped bucket-join candidate
  * machinery as every other dedup signature here.
  *
  * Reference analog: none (`/root/reference/src/MEDS_transforms` has no
  * text ops; this extends the LLM-pipeline surface per the build brief).
  */
object Winnow {

  /** Ordered window-minimum hashes over a BOUND hash-array column: for
    * each of the `max(len − w + 1, 1)` windows, the min of the `w`
    * hashes starting there (truncated at the tail — so docs with
    * 0 < len < w winnow the whole array to ONE fingerprint, the
    * standard short-doc convention). Empty in = empty out.
    *
    * `h` MUST be a projected column attribute, not an inline expression
    * (see the class doc).
    */
  def windowMins(h: Column, w: Int): Column =
    when(size(h) === 0, array().cast("array<long>"))
      .otherwise(transform(
        sequence(lit(1), greatest(size(h) - (w - 1), lit(1))),
        i => array_min(slice(h, i, lit(w)))))

  private def withHashes(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), TextFunctions.wordTokens(col(textCol)).as("__toks"))
      .select(col("id"),
        graft.functions.ShingleHashes.shingleHashes(col("__toks"), k).as("__h"))

  /** Per-doc fingerprint summary: (id, n_shingles, n_fingerprints,
    * density) where density = fingerprints / shingles (≈ 2/(w+1) for
    * prose, 1 for tiny docs, NULL for docs below k tokens).
    */
  def fingerprintStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 5,
      w: Int = 4): DataFrame = {
    require(k >= 1, s"shingle size k must be >= 1, got $k")
    require(w >= 1, s"window size w must be >= 1, got $w")
    withHashes(docs, idCol, textCol, k)
      .select(col("id"), size(col("__h")).cast("long").as("n_shingles"),
        windowMins(col("__h"), w).as("__wm"))
      .select(col("id"), col("n_shingles"),
        size(array_distinct(col("__wm"))).cast("long").as("n_fingerprints"))
      .withColumn("density",
        when(col("n_shingles") > 0,
          col("n_fingerprints").cast("double") / col("n_shingles").cast("double")))
  }

  /** Exploded (id, fp) distinct fingerprint table — the subsampled
    * drop-in for `Dedup.shingleHashTable` when full shingle volume is
    * the bottleneck: ~2/(w+1) of the rows with the same join-key
    * discipline (df caps, bucket joins) downstream.
    */
  def fingerprintTable(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 5,
      w: Int = 4): DataFrame =
    withHashes(docs, idCol, textCol, k)
      .select(col("id"),
        explode(array_distinct(windowMins(col("__h"), w))).as("fp"))
}
