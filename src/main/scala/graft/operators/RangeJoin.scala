package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: match each point row to the interval rows of
  * the same key whose `[start, end]` contains the point's time —
  * `points.t BETWEEN intervals.start AND intervals.end` with equality on
  * `on`. Spark has no native range join, and the naive plan (equi-join
  * on the key, range as a post-filter) degenerates when keys are hot:
  * one key's points × intervals all meet in one task before filtering.
  *
  * This operator buckets time into `binWidth`-sized bins: each interval
  * explodes to one row per covered bin (span-bounded by
  * `maxBinsPerInterval`, enforced with an error, never silent), points
  * map to exactly one bin, and the join key becomes (key..., bin) — so
  * a hot key's work spreads across its time range instead of one
  * reducer, and the equi-join stays a plain shuffled hash/merge join
  * Catalyst already knows how to plan. Each qualifying (point,
  * interval) pair is emitted exactly once (the point's single bin is
  * covered once per interval), so no dedup pass is needed.
  *
  * Times are numeric (use `unix_micros` for timestamps). Pick
  * `binWidth` near the typical interval length: shorter bins explode
  * intervals into more rows, longer bins coarsen the pre-filter and
  * push more work into the containment predicate.
  */
object RangeJoin {

  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      on: Seq[String],
      tCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      maxBinsPerInterval: Int = 10000
  ): DataFrame = {
    require(on.nonEmpty, "interval join needs at least one equality key")
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet) -- on
    require(overlap.isEmpty, s"non-key columns appear on both sides: $overlap — rename before joining")

    val p = points
      .filter(col(tCol).isNotNull)
      .withColumn("__bin", floor(col(tCol) / binWidth))
    val nBins = floor(col(endCol) / binWidth) - floor(col(startCol) / binWidth) + 1
    val i = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull && col(startCol) <= col(endCol))
      .withColumn("__bin",
        explode(when(nBins <= maxBinsPerInterval,
          sequence(floor(col(startCol) / binWidth), floor(col(endCol) / binWidth)))
          .otherwise(raise_error(concat(
            lit(s"intervalJoin: interval spans more than $maxBinsPerInterval bins of $binWidth — "),
            lit("widen binWidth or raise maxBinsPerInterval"))))))
    p.join(i, on :+ "__bin")
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__bin")
  }
}
