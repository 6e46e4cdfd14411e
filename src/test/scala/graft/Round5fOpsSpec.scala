package graft

import graft.operators.{Changepoint, FuzzyJoin}
import org.apache.spark.sql.functions._

/** Round-5 batch: CUSUM changepoints, sorted-neighborhood blocking. */
class Round5fOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d")

  // -------------------------------------------------------------- CUSUM

  test("cusum: a mid-series level shift peaks at the end of the shifted run") {
    // 10 points at 0, then 10 points at 5: mean 2.5; CUSUM climbs
    // through the second half and peaks at the last point
    val xs = Seq.fill(10)(0.0) ++ Seq.fill(10)(5.0)
    val ev = xs.zipWithIndex.map { case (v, i) => (1L, ts(i), i.toLong, v) }
      .toDF("user_id", "ts", "event_id", "value")
    val r = Changepoint.cusum(ev, "user_id", "ts", "value", "event_id").collect()(0)
    assert(r.getAs[Long]("n") == 20L)
    assert(math.abs(r.getAs[Double]("mean") - 2.5) < 1e-9)
    // each post-shift point adds (5 - 2.5); max = 10 * 2.5 at position 20
    assert(math.abs(r.getAs[Double]("cusum_max") - 25.0) < 1e-9)
    assert(r.getAs[Long]("cusum_at") == 20L)
  }

  test("cusum: a series that only drifts DOWN never accumulates (max 0, at 0)") {
    val xs = Seq(5.0, 5.0, 5.0, 0.0, 0.0, 0.0) // falls below its mean at the end
    val ev = xs.zipWithIndex.map { case (v, i) => (1L, ts(i), i.toLong, v) }
      .toDF("user_id", "ts", "event_id", "value")
    val r = Changepoint.cusum(ev, "user_id", "ts", "value", "event_id").collect()(0)
    // first half sits ABOVE the mean, so CUSUM rises there instead:
    // S peaks after the third 5.0 at 3 * (5 - 2.5)
    assert(math.abs(r.getAs[Double]("cusum_max") - 7.5) < 1e-9)
    assert(r.getAs[Long]("cusum_at") == 3L)
    // a strictly-below-mean tail then drains S back to 0
    val down = Seq(0.0, 0.0, 0.0).zipWithIndex.map { case (v, i) => (2L, ts(i), i.toLong, v) }
      .toDF("user_id", "ts", "event_id", "value")
    val r2 = Changepoint.cusum(down, "user_id", "ts", "value", "event_id").collect()(0)
    assert(r2.getAs[Double]("cusum_max") == 0.0 && r2.getAs[Long]("cusum_at") == 0L)
  }

  test("cusum: flat-with-one-spike peaks AT the spike, unlike a sustained shift") {
    val xs = Seq(1.0, 1.0, 1.0, 9.0, 1.0, 1.0, 1.0, 1.0)
    val ev = xs.zipWithIndex.map { case (v, i) => (1L, ts(i), i.toLong, v) }
      .toDF("user_id", "ts", "event_id", "value")
    val r = Changepoint.cusum(ev, "user_id", "ts", "value", "event_id").collect()(0)
    assert(r.getAs[Long]("cusum_at") == 4L, "single spike -> peak right at it")
  }

  // ---------------------------------------- sorted-neighborhood blocking

  test("sortedNeighborPairs: suffix typos sharing every token-block prefix are found") {
    val df = Seq("smith co", "smith cox", "smith gmbh", "zeta inc")
      .toDF("name")
    val out = FuzzyJoin.sortedNeighborPairs(df, "name", maxDist = 2, windowSize = 3)
      .collect().map(r => (r.getAs[String]("a_name"), r.getAs[String]("b_name"))).toSet
    assert(out.contains(("smith co", "smith cox")),
      s"adjacent-in-sort suffix typo must pair: $out")
    assert(!out.exists(p => p._1.startsWith("zeta") || p._2.startsWith("zeta")),
      "different prefix block never pairs")
  }

  test("sortedNeighborPairs: only neighbors within the window pair up") {
    // 4 names in one block, window 3 -> offsets 1..2; first/last never pair
    val df = Seq("aaaa", "aaab", "aaac", "aaad").toDF("name")
    val out = FuzzyJoin.sortedNeighborPairs(df, "name", maxDist = 10, windowSize = 3)
      .collect().map(r => (r.getAs[String]("a_name"), r.getAs[String]("b_name"))).toSet
    assert(out.contains(("aaaa", "aaab")) && out.contains(("aaaa", "aaac")))
    assert(!out.contains(("aaaa", "aaad")), s"beyond-window pair leaked: $out")
    assert(out.size == 5)
  }

  test("sortedNeighborPairs: case folds and duplicates collapse before ranking") {
    val df = Seq("Acme", "acme", "acmex").toDF("name")
    val out = FuzzyJoin.sortedNeighborPairs(df, "name", maxDist = 3, windowSize = 2)
      .collect().map(r => (r.getAs[String]("a_name"), r.getAs[String]("b_name")))
    assert(out.toSet == Set(("acme", "acmex")))
  }
}
