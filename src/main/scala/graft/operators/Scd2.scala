package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history: turn an append-only change
  * log (one row per version of a key) into validity intervals —
  * `valid_from` = the version's own timestamp, `valid_to` = the NEXT
  * version's timestamp (NULL while current). The standard warehouse
  * shape for "what did this row look like at time t", and the batch
  * complement of [[Compact.latestPerKey]] (which keeps only the last
  * interval).
  *
  * Scale shape: ONE shuffle on the key columns; `lead` over a
  * key-partitioned window is evaluated in a single sorted pass per
  * partition with O(1) lookahead state — no self-join of the log to
  * itself, no global sort. Keys are change-log keys (bounded versions
  * each), so no partition-less window appears at any scale.
  *
  * Determinism: versions are ordered by (ts, tieBreak); two versions
  * sharing a timestamp produce a zero-length interval for the
  * tie-break-earlier one, which is the conventional SCD2 reading of
  * same-instant writes.
  */
object Scd2 {

  /** All columns of `log` plus `valid_from` (= `tsCol`), `valid_to`
    * (next version's `tsCol`, NULL for the current version) and
    * `is_current`. Rows with a NULL `tsCol` must be filtered or
    * defaulted by the caller first — an un-ordered version has no
    * place on the timeline.
    */
  def history(
      log: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieBreakCol: String
  ): DataFrame = {
    require(keys.nonEmpty, "scd2 requires at least one key column")
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    val nextTs: Column = lead(col(tsCol), 1).over(w)
    log
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", nextTs)
      .withColumn("is_current", col("valid_to").isNull)
  }
}
