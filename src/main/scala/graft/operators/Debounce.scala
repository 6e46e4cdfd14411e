package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Debounce: drop events that repeat within `gapUs` of the PREVIOUS
  * event on the same key — double-clicks, sensor chatter, retried
  * webhook deliveries. The batch twin of a streaming
  * dropDuplicatesWithinWatermark on a (key, time-bucket) — but with
  * lag semantics ("quiet period since the last event"), not bucket
  * semantics.
  *
  * Simple-lag semantics, deliberately: a row survives iff the gap to
  * its immediate predecessor (kept or not) exceeds `gapUs`. The
  * alternative — gap since the last KEPT row — is a running chain that
  * needs a sequential scan per key; lag semantics give the same answer
  * on bursty-then-quiet data, are one window expression, and are
  * SQL-portable for the oracle.
  *
  * One key-partitioned window — single shuffle on the key, O(n) frame
  * walk, no state.
  */
object Debounce {

  /** Rows whose previous same-key event is MORE than `gapUs` older —
    * strictly: an event exactly `gapUs` after its predecessor is still a
    * repeat (the key's first event always survives). Null-time rows are
    * passed
    * through untouched — they carry no position in the stream. Ties
    * are ordered by `tieCol` so "simultaneous" duplicates debounce
    * deterministically (the lowest tie survives).
    */
  def debounce(
      df: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      gapUs: Long,
      tieCol: String): DataFrame = {
    require(gapUs >= 0, s"gapUs must be >= 0, got $gapUs")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(unix_micros(col(timeCol)), col(tieCol))
    // Null-time rows bypass the window entirely — inside it they'd sort
    // first and hand the real first event a NULL lag it didn't earn.
    val timed = df.filter(col(timeCol).isNotNull)
    val kept = timed
      .withColumn("__prev", lag(unix_micros(col(timeCol)), 1).over(w))
      .filter(coalesce(unix_micros(col(timeCol)) - col("__prev") > gapUs, lit(true)))
      .drop("__prev")
    df.filter(col(timeCol).isNull).unionByName(kept)
  }
}
