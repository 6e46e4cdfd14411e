package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1L to 5000L).map { i =>
    (s"C${i % 3}", i % 700) // 3 codes, ≤700 distinct users each
  }.toDF("code", "user_id")

  test("incremental (two-level) merge agrees with one-shot merge within error") {
    // simulate 4 ingest shards, each sketched independently
    val partials = Sketches.distinctSketchPartials(
      rows.withColumn("shard", col("user_id") % 4),
      Seq("code", "shard"), "user_id")
    val oneShot = Sketches.estimate(
      Sketches.mergeSketchPartials(partials.drop("shard"), Seq("code")))
      .as[(String, Long)].collect().toMap
    // two-level merge: days {0,1} and {2,3} union first (yesterday's
    // rollup), then the rollups union — the incremental-ingest path
    val level1 = Sketches.mergeSketchPartials(
      partials.withColumn("half", col("shard") % 2).drop("shard"),
      Seq("code", "half")).drop("half")
    val incremental = Sketches.estimate(
      Sketches.mergeSketchPartials(level1, Seq("code")))
      .as[(String, Long)].collect().toMap
    // merge topology may shift the estimate a few counts (sparse→dense
    // promotion points differ) but never outside estimator error
    oneShot.foreach { case (code, o) =>
      assert(math.abs(incremental(code) - o) <= math.max(3, (0.03 * o).toLong),
        s"$code: incremental ${incremental(code)} vs one-shot $o")
    }
  }

  test("merged shard partials stay within HLL error of the whole-table sketch") {
    val whole = Sketches.estimate(
      Sketches.distinctSketchPartials(rows, Seq("code"), "user_id"))
      .as[(String, Long)].collect().toMap
    val partials = Sketches.distinctSketchPartials(
      rows.withColumn("shard", col("user_id") % 4),
      Seq("code", "shard"), "user_id").drop("shard")
    val merged = Sketches.estimate(
      Sketches.mergeSketchPartials(partials, Seq("code")))
      .as[(String, Long)].collect().toMap
    whole.foreach { case (code, w) =>
      assert(math.abs(merged(code) - w) <= math.max(3, (0.03 * w).toLong),
        s"$code: merged ${merged(code)} vs whole $w")
    }
  }

  test("estimates land within HLL error of the exact counts") {
    val exact = rows.groupBy("code").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val est = Sketches.estimate(
      Sketches.distinctSketchPartials(rows, Seq("code"), "user_id"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (code, n) =>
      assert(math.abs(est(code) - n) <= math.max(3, (0.05 * n).toLong),
        s"$code: est ${est(code)} vs exact $n")
    }
  }
}
