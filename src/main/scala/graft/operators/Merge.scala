package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-based upsert (the SQL MERGE / Delta `MERGE INTO` shape): rows of
  * `updates` replace target rows with the same key, and keys absent from
  * the target are appended. The incremental-ingest primitive that turns
  * a CDC feed ([[Diff]] output, a change log compacted by
  * [[Compact.latestPerKey]]) back into a current-state table.
  *
  * Scale shape: ONE left-anti join on the key — each side shuffles once
  * on the key columns (AQE upgrades to broadcast when the update batch
  * is small, the common case for incremental loads), then a
  * shuffle-free unionByName. No window, no distinct over the target, no
  * full-outer join carrying every column of both sides: the anti join
  * probes keys only, so the wide target payload crosses the wire
  * exactly once, already in its final form.
  */
object Merge {

  /** `target` with `updates` applied. `updates` must be key-unique
    * (compact a multi-version log with [[Compact.latestPerKey]] first) —
    * duplicate update keys would both survive, since last-writer-wins
    * is not defined without an ordering column. Both inputs must share
    * the `keys` columns; output columns follow `target`'s order.
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    val missing = keys.filterNot(updates.columns.contains)
    require(missing.isEmpty, s"updates is missing key column(s): ${missing.mkString(", ")}")
    target
      .join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates.select(target.columns.map(col): _*))
  }
}
