package graft

import graft.operators.{Funnel, Retention}
import graft.pipeline.Sampling
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class FunnelRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (user, time, type)
  private def events(rows: (Long, String, String)*) =
    rows.map { case (u, t, tp) => (u, ts(t), tp) }.toDF("user_id", "ts", "event_type")

  test("funnel matches steps strictly in order") {
    val df = events(
      (1L, "2024-01-01 00:00:00", "signup"),
      (1L, "2024-01-02 00:00:00", "view"),
      (1L, "2024-01-03 00:00:00", "purchase"),
      // user 2: purchase BEFORE the view -> stops at step 2
      (2L, "2024-01-01 00:00:00", "signup"),
      (2L, "2024-01-02 00:00:00", "purchase"),
      (2L, "2024-01-03 00:00:00", "view"),
      // user 3: never signed up -> not in output
      (3L, "2024-01-01 00:00:00", "view"),
      (3L, "2024-01-02 00:00:00", "purchase")
    )
    val out = Funnel
      .funnel(df, "user_id", "ts", "event_type", Seq("signup", "view", "purchase"))
      .orderBy("key")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 2L)) // reached
    assert(!out(0).isNullAt(4) && out(1).isNullAt(4))  // step_3_us
  }

  test("funnel earliest-first: later repeats don't move matched times") {
    val df = events(
      (1L, "2024-01-01 00:00:00", "signup"),
      (1L, "2024-01-05 00:00:00", "signup"),
      (1L, "2024-01-06 00:00:00", "view")
    )
    val r = Funnel.funnel(df, "user_id", "ts", "event_type", Seq("signup", "view")).head()
    assert(r.getLong(2) == ts("2024-01-01 00:00:00").getTime * 1000L)
    assert(r.getLong(3) == ts("2024-01-06 00:00:00").getTime * 1000L)
  }

  test("funnel requires strictly-after: same-instant next step doesn't count") {
    val df = events(
      (1L, "2024-01-01 00:00:00", "signup"),
      (1L, "2024-01-01 00:00:00", "view"))
    val r = Funnel.funnel(df, "user_id", "ts", "event_type", Seq("signup", "view")).head()
    assert(r.getLong(1) == 1L)
    assert(r.isNullAt(3))
  }

  test("cohort retention counts distinct keys per (cohort, offset)") {
    val day = 86400000000L
    val df = events(
      (1L, "2024-01-01 00:00:00", "a"), // cohort d0
      (1L, "2024-01-02 00:00:00", "a"), // offset 1
      (1L, "2024-01-02 12:00:00", "a"), // same offset, same user -> 1 distinct
      (2L, "2024-01-01 06:00:00", "a"), // cohort d0
      (3L, "2024-01-03 00:00:00", "a")  // cohort d2
    )
    val out = Retention
      .cohortRetention(df, "user_id", "ts", day)
      .orderBy("cohort", "offset")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (offset, n_active)
    assert(out.toSeq == Seq((0L, 2L), (1L, 1L), (0L, 1L)))
  }

  test("weighted sampling favors heavy rows and is deterministic") {
    val df = (1L to 200L).map(i => (i, if (i <= 20) 1000.0 else 1.0))
      .toDF("id", "w")
    val picked = Sampling.weightedSampleN(df, "id", "w", 20, "s").collect()
      .map(_.getLong(0)).toSet
    // the 20 heavy rows are 1000x likelier; expect most of them to win
    assert(picked.count(_ <= 20L) >= 15)
    val again = Sampling.weightedSampleN(df, "id", "w", 20, "s").collect()
      .map(_.getLong(0)).toSet
    assert(picked == again)
    // non-positive weights can never be selected
    val withZero = df.withColumn("w", when(col("id") === 5L, 0.0).otherwise(col("w")))
    assert(!Sampling.weightedSampleN(withZero, "id", "w", 200, "s")
      .collect().map(_.getLong(0)).contains(5L))
  }
}
