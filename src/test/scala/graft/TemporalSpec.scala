package graft

import graft.operators.{AsofJoin, Sessionize}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // left: (id, key, t, tag); right: (key, t, v)
  private lazy val left = Seq(
    (1L, 10L, ts("2024-01-01 00:00:00"), "a"),
    (2L, 10L, ts("2024-01-01 01:00:00"), "b"),
    (3L, 10L, ts("2024-01-01 02:00:00"), "c"),
    (4L, 20L, ts("2024-01-01 00:30:00"), "d"), // key with no right rows
    (5L, 10L, null.asInstanceOf[Timestamp], "e") // null time -> no match
  ).toDF("id", "key", "t", "tag")

  private lazy val right = Seq(
    (10L, ts("2024-01-01 00:00:00"), 100.0), // tie with left id=1 (inclusive)
    (10L, ts("2024-01-01 01:30:00"), 200.0),
    (10L, null.asInstanceOf[Timestamp], -1.0) // ignored
  ).toDF("key", "rt", "v")

  test("asof backward: inclusive match, latest-at-or-before, null-safe") {
    val out = AsofJoin
      .asof(left, right, on = Seq("key"), leftTimeCol = "t", rightTimeCol = "rt",
        rightCols = Seq("v"), rightPrefix = "m_")
      .select(col("id"), col("m_rt"), col("m_v"))
      .as[(Long, Option[Timestamp], Option[Double])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (Some(ts("2024-01-01 00:00:00")), Some(100.0))) // tie is inclusive
    assert(out(2L) == (Some(ts("2024-01-01 00:00:00")), Some(100.0))) // 01:30 is after
    assert(out(3L) == (Some(ts("2024-01-01 01:30:00")), Some(200.0)))
    assert(out(4L) == ((None, None))) // no right rows for key
    assert(out(5L) == ((None, None))) // null left time
  }

  test("asof forward: inclusive match, earliest-at-or-after") {
    val out = AsofJoin
      .asof(left, right, on = Seq("key"), leftTimeCol = "t", rightTimeCol = "rt",
        rightCols = Seq("v"), direction = AsofJoin.Forward, rightPrefix = "m_")
      .select(col("id"), col("m_v"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L) == Some(100.0)) // equal time eligible forward too
    assert(out(2L) == Some(200.0)) // next at-or-after 01:00 is 01:30
    assert(out(3L) == None) // nothing after 02:00
    assert(out(4L) == None)
    assert(out(5L) == None) // null left time must NOT grab the earliest right row
  }

  test("asof: NULL join keys never match (equality-join semantics)") {
    val l = Seq(
      (1L, Option(10L), ts("2024-01-01 01:00:00")),
      (2L, Option.empty[Long], ts("2024-01-01 01:00:00"))
    ).toDF("id", "key", "t")
    val r = Seq(
      (Option(10L), ts("2024-01-01 00:00:00"), 1.0),
      (Option.empty[Long], ts("2024-01-01 00:00:00"), -1.0)
    ).toDF("key", "rt", "v")
    for (dir <- Seq(AsofJoin.Backward, AsofJoin.Forward)) {
      val out = AsofJoin
        .asof(l, r, Seq("key"), "t", "rt", Seq("v"), direction = dir, rightPrefix = "m_")
        .select(col("id"), col("m_v")).as[(Long, Option[Double])].collect().toMap
      assert(out(2L).isEmpty, s"$dir: null-key left row matched a null-key right row")
      if (dir == AsofJoin.Backward) assert(out(1L).contains(1.0))
    }
  }

  test("asof forward ties on (key, time) resolve to the LEAST payload deterministically") {
    val l = Seq((1L, 10L, ts("2024-01-01 00:00:00"))).toDF("id", "key", "t")
    val r = Seq(
      (10L, ts("2024-01-01 00:00:00"), 5.0),
      (10L, ts("2024-01-01 00:00:00"), 9.0)
    ).toDF("key", "rt", "v")
    val out = AsofJoin
      .asof(l, r, Seq("key"), "t", "rt", Seq("v"),
        direction = AsofJoin.Forward, rightPrefix = "m_")
      .select("m_v").as[Double].collect()
    assert(out.toSeq == Seq(5.0))
  }

  test("asof tolerance nulls out too-distant matches") {
    val out = AsofJoin
      .asof(left, right, on = Seq("key"), leftTimeCol = "t", rightTimeCol = "rt",
        rightCols = Seq("v"), rightPrefix = "m_", toleranceUs = Some(30L * 60 * 1000000))
      .select(col("id"), col("m_v"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L) == Some(100.0)) // distance 0
    assert(out(2L) == None) // 00:00 match is 60min > 30min away
    assert(out(3L) == Some(200.0)) // 01:30 match is exactly 30min away
  }

  test("asof ties on (key, time) resolve to the greatest payload deterministically") {
    val l = Seq((1L, 10L, ts("2024-01-01 00:00:00"))).toDF("id", "key", "t")
    val r = Seq(
      (10L, ts("2024-01-01 00:00:00"), 5.0),
      (10L, ts("2024-01-01 00:00:00"), 9.0)
    ).toDF("key", "rt", "v")
    val out = AsofJoin.asof(l, r, Seq("key"), "t", "rt", Seq("v"), rightPrefix = "m_")
      .select("m_v").as[Double].collect()
    assert(out.toSeq == Seq(9.0))
  }

  test("asof plan: one shuffle on the key, no join operator") {
    val out = AsofJoin.asof(left, right, Seq("key"), "t", "rt", Seq("v"))
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), s"asof must not plan a join:\n$plan")
    assert(plan.split("Exchange").length - 1 <= 2, // one per union branch pre-AQE accounting
      s"asof should shuffle only on the key:\n$plan")
  }

  test("sessionWindowSummaries agrees with the lag-based sessionizer away from exact-gap ties") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 10:10:00")),
      (3L, 1L, ts("2024-01-01 11:00:00")), // 50min gap -> new session
      (4L, 2L, ts("2024-01-01 10:05:00"))
    ).toDF("id", "k", "t")
    val viaWindow = Sessionize.sessionWindowSummaries(e, "k", "t", "30 minutes")
      .select("k", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaLag = Sessionize.sessionSummaries(e, "k", "t", 1800L * 1000000L, "id")
      .select("k", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaWindow == viaLag)
  }

  test("sessionWindowSummaries: a gap of exactly the window EXTENDS the session (lag-rule parity)") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 10:30:00")), // exactly 30min later: merged
      (3L, 1L, ts("2024-01-01 11:00:01"))  // 30min 1s later: new session
    ).toDF("id", "k", "t")
    assert(Sessionize.sessionWindowSummaries(e, "k", "t", "30 minutes").count() == 2)
    assert(Sessionize.sessionSummaries(e, "k", "t", 1800L * 1000000L, "id").count() == 2)
  }

  test("sessionize: gaps split sessions, 0-based per key, deterministic ties") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:10:00")), // same session (10 min)
      (3L, 10L, ts("2024-01-01 01:00:00")), // 50 min gap > 30 min -> new
      (4L, 10L, ts("2024-01-01 01:00:00")), // tie: same time, same session
      (5L, 20L, ts("2024-01-01 05:00:00")), // other key starts at 0
      (6L, 20L, null.asInstanceOf[Timestamp]) // dropped
    ).toDF("event_id", "user_id", "t")
    val out = Sessionize
      .assignSessions(ev, "user_id", "t", gapUs = 30L * 60 * 1000000, tieBreakCol = "event_id")
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("sessionize summaries: counts and bounds per session") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:10:00")),
      (3L, 10L, ts("2024-01-01 01:00:00"))
    ).toDF("event_id", "user_id", "t")
    val out = Sessionize
      .sessionSummaries(ev, "user_id", "t", gapUs = 30L * 60 * 1000000, tieBreakCol = "event_id")
      .select("session_seq", "n_events", "duration_us").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 2L, 600000000L), (1L, 1L, 0L)))
  }

  test("intervalJoin: inclusive bounds, multi-bin intervals, exactly-once pairs") {
    import graft.operators.RangeJoin
    val points = Seq(
      (1L, 10L, 100L),  // inside first interval
      (2L, 10L, 250L),  // == interval end (inclusive)
      (3L, 10L, 251L),  // just past -> no match
      (4L, 10L, 5L),    // == interval start (inclusive)
      (5L, 20L, 100L)   // right key, no intervals for key 20
    ).toDF("pid", "key", "t")
    val intervals = Seq(
      (10L, 5L, 250L, "a"),   // spans bins 0..2 at width 100
      (10L, 300L, 310L, "b")
    ).toDF("key", "s", "e", "tag")
    val out = RangeJoin.intervalJoin(points, intervals, Seq("key"), "t", "s", "e", binWidth = 100L)
      .select("pid", "tag").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "a", 4L -> "a"))
    // multi-bin interval must not duplicate pairs
    val n = RangeJoin.intervalJoin(points, intervals, Seq("key"), "t", "s", "e", binWidth = 10L).count()
    assert(n == 3)
  }

  test("intervalJoin: over-wide intervals raise instead of exploding silently") {
    import graft.operators.RangeJoin
    val points = Seq((1L, 10L, 100L)).toDF("pid", "key", "t")
    val wide = Seq((10L, 0L, 10000000L)).toDF("key", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.intervalJoin(points, wide, Seq("key"), "t", "s", "e",
        binWidth = 10L, maxBinsPerInterval = 100).count()
    }
    assert(ex.getMessage.contains("intervalJoin") ||
      Option(ex.getCause).exists(_.getMessage.contains("intervalJoin")))
  }

  test("intervalJoin into session intervals agrees with direct session assignment") {
    import graft.operators.RangeJoin
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:10:00")),
      (3L, 10L, ts("2024-01-01 01:00:00")),
      (4L, 20L, ts("2024-01-01 05:00:00"))
    ).toDF("event_id", "user_id", "t")
    val gap = 30L * 60 * 1000000
    val direct = Sessionize.assignSessions(ev, "user_id", "t", gap, "event_id")
      .select(col("event_id"), col("session_seq")).as[(Long, Long)].collect().toMap
    val sessions = Sessionize.sessionSummaries(ev, "user_id", "t", gap, "event_id")
      .select(col("user_id"), col("session_seq"), col("start_us"), col("end_us"))
    val points = ev.select(col("event_id"), col("user_id"), unix_micros(col("t")).as("tu"))
    val joined = RangeJoin.intervalJoin(points, sessions, Seq("user_id"), "tu", "start_us", "end_us",
        binWidth = 3600L * 1000000)
      .select(col("event_id"), col("session_seq")).as[(Long, Long)].collect().toMap
    assert(joined == direct)
  }

  test("sessionize matches the streaming sessionizer on a shared fixture") {
    // batch twin contract: same gap, same grouping of events into sessions
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:20:00")),
      (3L, 10L, ts("2024-01-01 02:00:00")),
      (4L, 20L, ts("2024-01-01 00:00:00"))
    ).toDF("event_id", "user_id", "t")
    val batch = Sessionize
      .sessionSummaries(ev, "user_id", "t", gapUs = 30L * 60 * 1000000, tieBreakCol = "event_id")
      .select("user_id", "n_events").as[(Long, Long)].collect().sorted.toSeq
    assert(batch == Seq((10L, 1L), (10L, 2L), (20L, 1L)))
  }
}
