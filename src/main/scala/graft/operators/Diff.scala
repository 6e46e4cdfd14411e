package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff (CDC without a log): given two versions of a keyed
  * table, emit which keys were added, removed, or changed — the
  * incremental-ingest primitive for pipelines that re-derive a corpus
  * periodically and want to reprocess only the delta (re-embed only
  * changed documents, re-aggregate only touched patients).
  *
  * Scale shape: each side is reduced to (key, fingerprint) BEFORE the
  * shuffle — the full-outer join moves two narrow columns per row, not
  * the payload — then joined on the key (AQE-planned; bucketed
  * snapshots join exchange-free via [[graft.sources.Bucketed]]).
  * Unchanged keys (the overwhelming majority between consecutive
  * snapshots) are dropped post-join, so the output is delta-sized.
  *
  * The fingerprint hashes caller-chosen comparison columns; callers
  * normalize floats/timestamps into engine-stable forms (epoch micros,
  * scaled integers) when the diff must be replayable across engines.
  */
object Diff {

  /** (key columns..., status) where status ∈ added | removed | changed.
    * `fingerprint` is any deterministic per-row Column over the
    * comparison payload (e.g. md5 of normalized fields).
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      fingerprint: Column
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    // explicit presence markers: a NULL fingerprint (nullable payload
    // hashed to null) must not masquerade as an absent row
    val o = oldDf.select(
      keyCols.map(col) ++ Seq(fingerprint.as("__fp_old"), lit(1).as("__in_old")): _*)
    val n = newDf.select(
      keyCols.map(col) ++ Seq(fingerprint.as("__fp_new"), lit(1).as("__in_new")): _*)
    o.join(n, keyCols, "full_outer")
      .withColumn(
        "status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!(col("__fp_old") <=> col("__fp_new")), lit("changed")))
      .filter(col("status").isNotNull)
      .select(keyCols.map(col) :+ col("status"): _*)
  }
}
