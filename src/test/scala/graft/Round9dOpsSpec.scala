package graft

import graft.operators.{Attribution, Drift, Retention}
import graft.pipeline.Sampling
import org.apache.spark.sql.functions._

/** Round-9 batch T: time-decay attribution, DAU/WAU stickiness,
  * balanced class downsampling, quantile-quantile drift.
  */
class Round9dOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("timeDecayAttribution: half-life weights normalize to 1 per journey") {
    val hl = 1000000L // 1s half-life in us
    val ev = Seq(
      (1L, t(0), "A", 1L), (1L, t(1), "B", 2L), (1L, t(2), "conv", 3L),
      (2L, t(0), "conv", 4L), // conversion-first: no touches, no credit
      (3L, t(0), "A", 5L) // never converts: contributes nothing
    ).toDF("u", "ts", "et", "id")
    val got = Attribution.timeDecayAttribution(ev, "u", "ts", "et", "id", "conv", hl)
      .collect().map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_touches"), r.getAs[Double]("total_credit"))).toMap
    // w_A = 0.5^2 = 0.25, w_B = 0.5^1 = 0.5 -> credits 1/3 and 2/3
    assert(got.keySet == Set("A", "B"))
    assert(got("A") == ((1L, 0.333333)))
    assert(got("B") == ((1L, 0.666667)))
  }

  test("rollingActives: trailing-window actives and stickiness") {
    def d(day: Long) = new java.sql.Timestamp(day * 86400000L + 1000L)
    val ev = Seq((1L, d(0)), (1L, d(3)), (2L, d(0))).toDF("u", "ts")
    val got = Retention.rollingActives(ev, "u", "ts", windowDays = 7)
      .collect().map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Double]("stickiness"))).toMap
    assert(got.keySet == Set(0L, 3L), "only days with daily actives emit")
    assert(got(0L) == ((2L, 2L, 1.0)))
    assert(got(3L) == ((1L, 2L, 0.5)), "u2's day-0 activity is inside day 3's window")
  }

  test("balanceClasses: every class capped at the min class, deterministic, nulls dropped") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(2)("b") ++ Seq(null.asInstanceOf[String]))
      .zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("id", "cls")
    val out = Sampling.balanceClasses(df, "cls", "id", "s1")
    val byClass = out.groupBy("cls").count().collect()
      .map(r => r.getAs[String]("cls") -> r.getAs[Long]("count")).toMap
    assert(byClass == Map("a" -> 2L, "b" -> 2L))
    val again = Sampling.balanceClasses(df, "cls", "id", "s1")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(again == out.collect().map(_.getAs[Long]("id")).toSet, "same seed, same rows")
  }

  test("correlationMatrix: one pass yields every cell; listwise-complete n; NULL on zero variance") {
    import graft.operators.Stats
    val rows: Seq[(Option[Double], Double, Double, Double)] =
      (1 to 10).map(i => (Some(i.toDouble), 2.0 * i, -1.0 * i, 7.0)) :+
        ((Option.empty[Double], 1.0, 1.0, 7.0))
    val typed = rows.toDF("x", "y", "z", "const")
    val got = Stats.correlationMatrix(typed, Seq("x", "y", "z", "const"))
      .collect().map(r => (r.getAs[String]("feature_a"), r.getAs[String]("feature_b")) -> r).toMap
    assert(got.size == 6, "4 columns -> 6 unordered pairs")
    assert(got.values.forall(_.getAs[Long]("n") == 10L), "the null row drops from EVERY cell")
    assert(got(("x", "y")).getAs[Double]("corr") == 1.0)
    assert(got(("x", "z")).getAs[Double]("corr") == -1.0)
    assert(got(("y", "z")).getAs[Double]("corr") == -1.0)
    assert(got(("x", "const")).isNullAt(got(("x", "const")).fieldIndex("corr")),
      "zero-variance column -> NULL cell, visibly")
  }

  test("concentrationCurve: shares and running shares over value-decile bins") {
    import graft.operators.Stats
    val df = (1 to 10).map(_.toDouble).toDF("v")
    val got = Stats.concentrationCurve(df, "v", nBins = 2).collect()
      .map(r => r.getAs[Long]("bin") -> r).toMap
    assert(got.keySet == Set(0L, 1L))
    assert(got(0L).getAs[Long]("n") == 5L && got(1L).getAs[Long]("n") == 5L)
    assert(got(0L).getAs[Double]("value_share") == 0.272727) // 15/55
    assert(got(1L).getAs[Double]("value_share") == 0.727273) // 40/55
    assert(got(1L).getAs[Double]("cum_share") == 1.0)
    // all-equal values: every edge ties, everything lands in bin 0
    val flat = Seq.fill(6)(3.0).toDF("v")
    val f = Stats.concentrationCurve(flat, "v", nBins = 3).collect()
    assert(f.length == 1 && f.head.getAs[Long]("bin") == 0L)
    assert(f.head.getAs[Double]("cum_share") == 1.0)
  }

  test("qqDrift: the gap localizes the shift probe by probe") {
    val rows = (1 to 10).map(v => (true, v.toDouble)) ++
      (1 to 10).map(v => (false, v.toDouble + 10.0))
    val df = rows.toDF("ref", "v")
    val got = Drift.qqDrift(df, "v", col("ref"), Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getAs[Double]("p") -> r).toMap
    assert(got(0.5).getAs[Double]("q_ref") == 5.5)
    assert(got(0.5).getAs[Double]("q_cur") == 15.5)
    assert(got.values.forall(_.getAs[Double]("gap") == 10.0), "pure location shift: every gap 10")
  }
}
