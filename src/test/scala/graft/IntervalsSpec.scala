package graft

import graft.operators.Intervals
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("timeWeightedAverage: values weighted by how long they held") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0), // holds 10 s
      (1L, ts("2024-01-01 00:00:10"), 2L, 20.0), // holds 20 s
      (1L, ts("2024-01-01 00:00:30"), 3L, 30.0)  // endpoint, holds nothing
    ).toDF("user_id", "ts", "event_id", "value")
    val r = Intervals.timeWeightedAverage(ev, "user_id", "ts", "value", "event_id").collect()(0)
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("span_s") == 30.0)
    // (10*10 + 20*20) / 30 = 500/30; a plain mean would say 20
    assert(math.abs(r.getAs[Double]("twa") - 500.0 / 30.0) < 1e-9)
  }

  test("timeWeightedAverage: chatty periods don't over-weight like a plain mean") {
    // value 100 sampled 10x in one second, then value 0 holds a minute
    val fast = (0 until 10).map(i => (1L, ts(f"2024-01-01 00:00:0${i / 10}") , i.toLong, 100.0))
    val ev = (fast :+ ((1L, ts("2024-01-01 00:00:01"), 99L, 0.0))
      :+ ((1L, ts("2024-01-01 00:01:01"), 100L, 0.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val twa = Intervals.timeWeightedAverage(ev, "user_id", "ts", "value", "event_id")
      .collect()(0).getAs[Double]("twa")
    assert(twa < 5.0, s"one second of 100 over a 61s span must stay small, got $twa")
  }

  test("timeWeightedAverage: single observation has no elapsed time -> NULL") {
    val ev = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 5.0))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Intervals.timeWeightedAverage(ev, "user_id", "ts", "value", "event_id").collect()(0)
    assert(r.isNullAt(r.fieldIndex("twa")) && r.getAs[Double]("span_s") == 0.0)
  }

  test("activityCoverage: overlapping intervals merge, gaps split islands") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L), // [0, 5m)
      (1L, ts("2024-01-01 00:02:00"), 2L), // [2m, 7m) -> merges
      (1L, ts("2024-01-01 00:10:00"), 3L)  // [10m, 15m) -> new island
    ).toDF("user_id", "ts", "event_id")
    val r = Intervals.activityCoverage(ev, "user_id", "ts", "event_id", 300000000L).collect()(0)
    assert(r.getAs[Long]("n_islands") == 2L)
    assert(r.getAs[Long]("covered_us") == (7L + 5L) * 60L * 1000000L)
  }

  test("activityCoverage: touching endpoints merge (half-open intervals)") {
    // [0, 5m) then an event AT 5m: s == prior end -> NOT s > end -> same island
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:05:00"), 2L)
    ).toDF("user_id", "ts", "event_id")
    val r = Intervals.activityCoverage(ev, "user_id", "ts", "event_id", 300000000L).collect()(0)
    assert(r.getAs[Long]("n_islands") == 1L)
    assert(r.getAs[Long]("covered_us") == 10L * 60L * 1000000L)
  }

  test("activityCoverage: an engulfed interval can't reopen a closed island") {
    // [0, 10m) engulfs [1m, 6m); event at 8m starts nothing new even
    // though it is past the ENGULFED interval's end
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:01:00"), 2L),
      (1L, ts("2024-01-01 00:08:00"), 3L)
    ).toDF("user_id", "ts", "event_id")
    val r = Intervals.activityCoverage(ev, "user_id", "ts", "event_id", 600000000L).collect()(0)
    assert(r.getAs[Long]("n_islands") == 1L)
    assert(r.getAs[Long]("covered_us") == 18L * 60L * 1000000L) // [0, 18m)
  }

  test("eventPaths: ordered, tie-broken, truncated at maxSteps with full count visible") {
    import graft.operators.Transitions
    val t0 = ts("2024-01-01 10:00:00")
    val ev = (Seq(
      (1L, ts("2024-01-01 10:00:02"), 3L, "purchase"),
      (1L, t0, 2L, "view"),   // same ts as signup: event_id breaks the tie
      (1L, t0, 1L, "signup")
    ) ++ (4 to 15).map(i => (2L, ts(f"2024-01-01 10:00:$i%02d"), i.toLong, s"e$i")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Transitions.eventPaths(ev, "user_id", "ts", "event_type", "event_id", maxSteps = 10)
      .collect().map(r => r.getAs[Long]("key") ->
        ((r.getAs[Long]("n_events"), r.getAs[String]("path")))).toMap
    assert(out(1L) == ((3L, "signup>view>purchase")))
    assert(out(2L)._1 == 12L, "n_events counts the FULL history")
    assert(out(2L)._2 == (4 to 13).map(i => s"e$i").mkString(">"), "path truncates at 10")
  }
}
