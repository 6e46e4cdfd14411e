package graft

import graft.operators.{Evaluation, Logistic, Survival}
import org.apache.spark.sql.functions._

/** Round-8 batch I: RMST, Hosmer-Lemeshow, weight ESS, placebo-style
  * refutation properties.
  */
class BatchISpec extends SparkSpec {
  import spark.implicits._

  private def subjects(rows: Seq[(Long, Long, String)]) =
    rows.map { case (u, day, t) =>
      (u, new java.sql.Timestamp(day * 86400000L), t, u * 1000 + day)
    }.toDF("u", "ts", "typ", "eid")

  test("restrictedMeanSurvival: hand-computed step integral") {
    // 2 subjects: one converts on day 2, one censored at day 4
    // curve: day2 n_risk=2 d=1 -> S=.5 ; day4 censored -> S stays .5
    // RMST(10) = 1.0*2 + 0.5*(4-2) + 0.5*(10-4) = 6.0
    val ev = subjects(Seq(
      (1L, 0L, "x"), (1L, 2L, "buy"),
      (2L, 0L, "x"), (2L, 4L, "x")))
    val r = Survival.restrictedMeanSurvival(ev, "u", "ts", "typ", "buy", 10L)
      .collect().head
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("n_events") == 1L)
    assert(math.abs(r.getAs[Double]("rmst") - 6.0) < 1e-4,
      s"got ${r.getAs[Double]("rmst")}")
  }

  test("restrictedMeanSurvival: horizon truncates; everyone-survives gives tau") {
    val ev = subjects((1L to 10L).map(u => (u, 30L, "x")) // all censored at day 30
      .flatMap(t => Seq((t._1, 0L, "x"), t)))
    val r = Survival.restrictedMeanSurvival(ev, "u", "ts", "typ", "buy", 7L)
      .collect().head
    assert(math.abs(r.getAs[Double]("rmst") - 7.0) < 1e-6,
      "no events inside the horizon => RMST = tau")
  }

  test("restrictedMeanSurvival: immediate conversion gives ~0") {
    val ev = subjects(Seq((1L, 0L, "buy"), (2L, 0L, "buy")))
    val r = Survival.restrictedMeanSurvival(ev, "u", "ts", "typ", "buy", 5L)
      .collect().head
    assert(r.getAs[Double]("rmst") == 0.0)
  }

  test("hosmerLemeshow: calibrated scores pass, shifted scores fail") {
    val calibrated = (1 to 1000).map { i =>
      val p = 0.05 + (i % 10) * 0.1 // bins 0..9
      ("g", p, (i * 7919) % 100 < (p * 100).toInt) // hit rate tracks p
    }.toDF("g", "p", "y")
    val shifted = calibrated.withColumn("p", least(lit(1.0), col("p") + 0.35))
    val ok = Evaluation.hosmerLemeshow(calibrated, Seq("g"), "p", col("y")).collect().head
    val bad = Evaluation.hosmerLemeshow(shifted, Seq("g"), "p", col("y")).collect().head
    assert(bad.getAs[Double]("chi2") > 5 * ok.getAs[Double]("chi2"),
      s"shift must blow up chi2: ${ok.getAs[Double]("chi2")} vs ${bad.getAs[Double]("chi2")}")
    assert(bad.getAs[Double]("p_value") < 0.01)
  }

  test("hosmerLemeshow: degenerate bins are skipped and counted") {
    // all scores in one bin, all labels true -> E == n in that bin
    val rows = (1 to 100).map(_ => ("g", 1.0, true)).toDF("g", "p", "y")
    val r = Evaluation.hosmerLemeshow(rows, Seq("g"), "p", col("y")).collect().head
    assert(r.getAs[Long]("b_skipped") == 1L)
    assert(r.isNullAt(r.fieldIndex("chi2")), "fewer than 3 testable bins => NULL chi2")
  }

  test("weightDiagnostics: uniform propensities give ESS = n; one extreme weight tanks it") {
    val uniform = (1 to 100).map(i => (i % 2 == 0, 0.5)).toDF("t", "p")
    val u = Logistic.weightDiagnostics(uniform, "t", "p", clip = 0.0)
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    assert(math.abs(u("treated").getAs[Double]("ess_ratio") - 1.0) < 1e-6)
    val skewed = ((1 to 99).map(i => (true, 0.9)) :+ ((true, 0.01)))
      .toDF("t", "p")
    val s = Logistic.weightDiagnostics(skewed, "t", "p", clip = 0.001)
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    assert(s("treated").getAs[Double]("ess_ratio") < 0.7,
      s"one 100x weight must crush ESS, got ${s("treated").getAs[Double]("ess_ratio")}")
    assert(s("treated").getAs[Double]("max_w_share") > 0.3)
  }
}
