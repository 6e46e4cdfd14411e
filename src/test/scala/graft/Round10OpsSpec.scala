package graft

import graft.operators.{Evaluation, Fairness, Hypothesis, Stats}
import org.apache.spark.sql.functions._

/** Round-10 batch T/U: exact/paired/resampling tests, MI screen,
  * Kendall's W, per-class metrics, fairness audit.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("SpecialMath: Lanczos lfact matches ln(n!) to 1e-9") {
    val got = Seq(Tuple1(1L)).toDF("x")
      .select(
        graft.functions.SpecialMath.lfact(lit(5L)).as("f5"),
        graft.functions.SpecialMath.lfact(lit(0L)).as("f0"),
        graft.functions.SpecialMath.lfact(lit(20L)).as("f20"))
      .collect()(0)
    assert(math.abs(got.getDouble(0) - math.log(120.0)) < 1e-9)
    assert(math.abs(got.getDouble(1)) < 1e-9)
    assert(math.abs(got.getDouble(2) - (2L to 20L).map(i => math.log(i.toDouble)).sum) < 1e-9)
  }

  test("fisherExact: the 4x4-margin table gives the textbook two-sided p") {
    // a=3 b=1 c=1 d=3: p = (1+16+16+1)/70 = 0.485714...
    val rows = Seq.fill(3)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(3)((false, false))
    val df = rows.zipWithIndex.map { case ((e, o), i) => (i.toLong, "g", e, o) }
      .toDF("id", "g", "e", "o")
    val got = Hypothesis.fisherExact(df, Seq("g"), col("e"), col("o")).collect()(0)
    assert(got.getAs[Long]("a") == 3L && got.getAs[Long]("d") == 3L)
    assert(math.abs(got.getAs[Double]("p_value") - 0.485714) < 2e-6)
  }

  test("fisherExact: margins past maxTerms raise loudly") {
    val df = (0 until 100).map(i => (i.toLong, "g", i % 2 == 0, i % 3 == 0))
      .toDF("id", "g", "e", "o")
    val e = intercept[Exception] {
      Hypothesis.fisherExact(df, Seq("g"), col("e"), col("o"), maxTerms = 10L).collect()
    }
    assert(e.getMessage != null)
  }

  test("mcnemar: discordant flips drive the statistic; none means NULL") {
    // lang g: b=5 (T->F), c=1 (F->T): chi2 = 16/6 = 2.666667
    val rows = Seq.fill(5)(("g", true, false)) ++ Seq(("g", false, true)) ++
      Seq.fill(4)(("g", true, true)) ++ Seq.fill(3)(("h", true, true))
    val df = rows.toDF("g", "bef", "aft")
    val got = Hypothesis.mcnemar(df, Seq("g"), col("bef"), col("aft"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(got("g").getAs[Long]("b") == 5L && got("g").getAs[Long]("c") == 1L)
    assert(math.abs(got("g").getAs[Double]("chi2") - 2.666667) < 2e-6)
    val p = got("g").getAs[Double]("p_value")
    assert(p > 0.09 && p < 0.12, s"p=$p should be ~0.102")
    assert(got("h").isNullAt(got("h").fieldIndex("chi2")), "no discordant pairs -> NULL")
  }

  test("holm: step-down adjustment is the running prefix max, capped at 1") {
    val tests = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.04)).toDF("t", "p")
    val got = Hypothesis.holm(tests, "p", Seq("t"), alpha = 0.05)
      .collect().map(r => r.getAs[String]("t") ->
        (r.getAs[Long]("rank"), r.getAs[Double]("p_adj"), r.getAs[Boolean]("reject"))).toMap
    assert(got("t1") == ((1L, 0.03, true)))
    assert(got("t2") == ((2L, 0.04, true)))
    assert(got("t3") == ((3L, 0.04, true)))
  }

  test("holm: NULL p rows pass through untestable") {
    val tests = Seq(("t1", Some(0.5)), ("t2", None)).toDF("t", "p")
    val got = Hypothesis.holm(tests, "p", Seq("t"))
      .collect().map(r => r.getAs[String]("t") -> r).toMap
    assert(got("t2").isNullAt(got("t2").fieldIndex("p_adj")))
    assert(got("t1").getAs[Long]("m") == 1L)
  }

  test("randomizationTest: a separated signal is significant, a null one is not") {
    val sep = ((0 until 20).map(i => (i.toLong, 100.0, true)) ++
      (20 until 40).map(i => (i.toLong, 0.0, false))).toDF("id", "v", "a")
    val got = Hypothesis.randomizationTest(sep, "v", col("a"), "id", k = 19)
      .collect()(0)
    assert(got.getAs[Double]("d_obs") == 100.0)
    assert(got.getAs[Long]("k") == 19L)
    assert(got.getAs[Double]("p_value") <= 0.15,
      "a 100-vs-0 split should beat nearly every random relabeling")
    val flat = (0 until 40).map(i => (i.toLong, 7.0, i < 20)).toDF("id", "v", "a")
    val p1 = Hypothesis.randomizationTest(flat, "v", col("a"), "id", k = 19)
      .collect()(0).getAs[Double]("p_value")
    assert(p1 == 1.0, "identical values: every relabeling ties the observed 0")
  }

  test("miScreen: a perfect predictor carries H(y); a constant carries none") {
    val df = Seq(
      (true, "T", "c"), (true, "T", "c"), (false, "F", "c"), (false, "F", "c"))
      .toDF("y", "fa", "fb")
    val got = Stats.miScreen(df, Seq("fa", "fb"), col("y"))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(math.abs(got("fa").getAs[Double]("mi") - 0.693147) < 2e-6)
    assert(got("fa").getAs[Double]("nmi") == 1.0)
    assert(got("fb").getAs[Double]("mi") == 0.0)
    assert(got("fb").isNullAt(got("fb").fieldIndex("nmi")), "H(x)=0 -> NMI undefined")
  }

  test("kendallW: perfect agreement is W=1; incomplete blocks raise") {
    val agree = Seq(
      ("r1", "i1", 1.0), ("r1", "i2", 2.0), ("r1", "i3", 3.0),
      ("r2", "i1", 10.0), ("r2", "i2", 20.0), ("r2", "i3", 30.0))
      .toDF("r", "it", "v")
    val got = Stats.kendallW(agree, "r", "it", "v").collect()(0)
    assert(got.getAs[Long]("n_items") == 3L && got.getAs[Long]("n_raters") == 2L)
    assert(got.getAs[Double]("w") == 1.0)
    val e = intercept[Exception] {
      Stats.kendallW(agree.filter(col("it") =!= "i3" || col("r") =!= "r2"),
        "r", "it", "v").collect()
    }
    assert(e.getMessage != null)
  }

  test("kendallW: opposite rankings of two raters give W = 0") {
    val opp = Seq(
      ("r1", "i1", 1.0), ("r1", "i2", 2.0), ("r1", "i3", 3.0),
      ("r2", "i1", 3.0), ("r2", "i2", 2.0), ("r2", "i3", 1.0))
      .toDF("r", "it", "v")
    assert(Stats.kendallW(opp, "r", "it", "v").collect()(0).getAs[Double]("w") == 0.0)
  }

  test("classMetrics: per-class one-vs-rest counts and rates") {
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b")).toDF("t", "p")
    val got = Evaluation.classMetrics(df, "t", "p")
      .collect().map(r => r.getAs[String]("class") -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("tp") == 1L && a.getAs[Long]("fp") == 0L && a.getAs[Long]("fn") == 1L)
    assert(a.getAs[Double]("precision") == 1.0 && a.getAs[Double]("recall") == 0.5)
    assert(math.abs(a.getAs[Double]("f1") - 0.666667) < 2e-6)
    val b = got("b")
    assert(b.getAs[Double]("precision") == 0.5 && b.getAs[Double]("recall") == 1.0)
    // binary symmetric case: mcc_a == mcc_b
    assert(a.getAs[Double]("mcc") == b.getAs[Double]("mcc"))
  }

  test("fairnessAudit: disparity is measured against the largest group") {
    val rows = Seq.fill(6)(("maj", true, true)) ++ Seq.fill(4)(("maj", false, false)) ++
      Seq.fill(1)(("min", true, true)) ++ Seq.fill(9)(("min", false, false))
    val df = rows.toDF("g", "sel", "y")
    val got = Fairness.fairnessAudit(df, "g", col("sel"), col("y"))
      .collect().map(r => r.getAs[String]("group") -> r).toMap
    assert(got("maj").getAs[Double]("selection_ratio") == 1.0)
    val ratio = got("min").getAs[Double]("selection_ratio")
    assert(math.abs(ratio - 0.1 / 0.6) < 2e-6)
    assert(got("min").getAs[Boolean]("four_fifths_flag"))
    assert(!got("maj").getAs[Boolean]("four_fifths_flag"))
    assert(got("maj").getAs[Double]("tpr") == 1.0 && got("min").getAs[Double]("tpr") == 1.0)
  }
}
