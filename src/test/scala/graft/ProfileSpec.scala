package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: one row per column with exact counts and typed min/max") {
    val df = Seq(
      (1L, Some(2.0), Some("b")),
      (2L, None, Some("a")),
      (3L, Some(8.5), None),
      (4L, Some(2.0), Some("a"))
    ).toDF("id", "x", "s")
    val out = Profile.profile(df).collect().map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 4)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 4.0)
    assert(id.isNullAt(6) && id.isNullAt(7)) // numeric col: no string min/max
    val x = out("x")
    assert(x.getLong(2) == 1 && x.getLong(3) == 2) // one null, two distinct
    assert(x.getDouble(4) == 2.0 && x.getDouble(5) == 8.5)
    val s = out("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.getString(6) == "a" && s.getString(7) == "b")
  }

  test("histogram bins fixed-width, per group, excluding null/NaN") {
    val df = Seq(
      ("a", Some(10.0)), ("a", Some(49.9)), ("a", Some(50.0)),
      ("a", Some(-0.1)), ("b", Some(10.0)), ("a", None),
      ("a", Some(Double.NaN))
    ).toDF("g", "v")
    val out = Profile.histogram(df, "v", width = 50.0, by = Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(out == Set(
      ("a", 0L, 0.0, 2L),    // 10.0, 49.9
      ("a", 1L, 50.0, 1L),   // boundary lands in the upper bin
      ("a", -1L, -50.0, 1L), // negatives floor downward
      ("b", 0L, 0.0, 1L)))
  }

  test("profile: column subset and single-scan plan") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val out = Profile.profile(df, Seq("s"))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("s"))
    // all statistics come from ONE scan of the input
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.split("LocalTableScan|Scan ").length - 1 <= 1, s"profile must scan once:\n$plan")
  }
}
