package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Log compaction: reduce an append-only change log to the latest row
  * per key — the "current state" materialization of a CDC/upsert stream
  * (the batch twin of what a MERGE INTO upsert maintains incrementally;
  * [[Diff]] goes the other way and derives the change log).
  *
  * Shape: ONE groupBy(key) with a max-struct aggregate. A window
  * (`row_number` ... `rn = 1`) would shuffle EVERY version of every key
  * and discard all but one after the exchange; the max-struct form
  * partial-aggregates map-side, so the shuffle carries one candidate
  * row per (partition × key) — the difference between moving the log
  * and moving the state.
  */
object Compact {

  /** Latest row per `keyCols`, "latest" = greatest (orderCols...) tuple
    * left-to-right, which callers make total by ending with a unique
    * tie-breaker (else ties resolve by the remaining payload columns —
    * deterministic but surprising). Null order values rank lowest.
    * Output: full original schema, keys first.
    */
  def latestPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "latestPerKey needs at least one key column")
    require(orderCols.nonEmpty, "latestPerKey needs at least one order column")
    val payload = df.columns.filterNot(keyCols.contains).toSeq
    df.groupBy(keyCols.map(col): _*)
      .agg(max(struct(orderCols.map(col) ++ Seq(struct(payload.map(col): _*).as("__p")): _*)).as("__m"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"__m.__p.`$c`").as(c)): _*)
  }
}
