package graft

import graft.operators.{Causal, Evaluation, Hypothesis, Json, Quantiles, Rolling, Stats, Trend, ZOrder}
import org.apache.spark.sql.functions._

/** Round-10 batch W: IV/Wald, CvM, weighted quantiles, rolling median,
  * Hilbert layout, DTW, Krippendorff's alpha, NB/log-normal fits, JSON
  * field health.
  */
class Round10cOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("ivWald: LATE = ITT / first-stage; zero compliance gap is NULL") {
    // z=1: all treated, y=10; z=0: none treated, y=4 -> fs=1, itt=6, late=6
    val rows = (0 until 10).map(i => ("g", i < 5, i < 5, if (i < 5) 10.0 else 4.0))
    val df = rows.toDF("g", "z", "t", "y")
    val got = Causal.ivWald(df, Seq("g"), col("z"), col("t"), "y").collect()(0)
    assert(got.getAs[Double]("first_stage") == 1.0)
    assert(got.getAs[Double]("itt") == 6.0)
    assert(got.getAs[Double]("late") == 6.0)
    val same = rows.map { case (g, z, _, y) => (g, z, false, y) }.toDF("g", "z", "t", "y")
    val r2 = Causal.ivWald(same, Seq("g"), col("z"), col("t"), "y").collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("late")), "no compliance gap -> NULL LATE, not infinity")
  }

  test("cvmTest: identical samples integrate to 0; disjoint ones do not") {
    val same = (0 until 20).map(i => ("g", (i % 10).toDouble, i < 10)).toDF("g", "v", "a")
    assert(Hypothesis.cvmTest(same, Seq("g"), "v", col("a"))
      .collect()(0).getAs[Double]("t") == 0.0)
    val apart = ((0 until 10).map(i => ("g", i.toDouble, true)) ++
      (0 until 10).map(i => ("g", 100.0 + i, false))).toDF("g", "v", "a")
    val got = Hypothesis.cvmTest(apart, Seq("g"), "v", col("a")).collect()(0)
    assert(got.getAs[Long]("n_a") == 10L && got.getAs[Double]("t") > 1.0)
  }

  test("weightedQuantiles: the median follows the MASS, not the rows") {
    // values 1..4 weight 1, value 100 weight 96: half the mass is at 100
    val df = ((1 to 4).map(v => ("g", v.toDouble, 1.0)) :+ (("g", 100.0, 96.0)))
      .toDF("g", "v", "w")
    val got = Quantiles.weightedQuantiles(df, Seq("g"), "v", "w", Seq(0.5, 0.99))
      .collect().map(r => r.getAs[Double]("p") -> r.getAs[Double]("q")).toMap
    assert(got(0.5) == 100.0 && got(0.99) == 100.0)
    val e = intercept[Exception] {
      Quantiles.weightedQuantiles(df.withColumn("w", lit(-1.0)),
        Seq("g"), "v", "w", Seq(0.5)).collect()
    }
    assert(e.getMessage != null)
  }

  test("rollingMedian: a spike moves the trailing mean's twin by one slot only") {
    val df = Seq(1.0, 1.0, 100.0, 1.0, 1.0).zipWithIndex
      .map { case (v, i) => ("u", i.toLong, i.toLong, v) }.toDF("u", "t", "id", "v")
    val got = Rolling.rollingMedian(df, Seq("u"), "t", "id", "v", k = 3)
      .collect().map(r => r.getAs[Long]("t") -> r.getAs[Double]("roll_median")).toMap
    assert(got(0L) == 1.0 && got(1L) == 1.0)
    assert(got(2L) == 1.0, "window [1,1,100]: median holds at 1")
    assert(got(3L) == 1.0 && got(4L) == 1.0)
  }

  test("hilbertValue: the order-1 curve visits the 4 quadrants in U order") {
    val df = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      ZOrder.hilbertValue(col("x"), col("y"), bits = 1).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L, (1L, 1L) -> 2L, (1L, 0L) -> 3L))
  }

  test("hilbertValue: adjacent indices are adjacent cells (unit steps) at order 3") {
    val pts = for (x <- 0 until 8; y <- 0 until 8) yield (x.toLong, y.toLong)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.hilbertValue(col("x"), col("y"), 3).as("h"))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 64, "the index is a bijection over the grid")
    (0L until 63L).foreach { h =>
      val (x1, y1) = got(h); val (x2, y2) = got(h + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve step $h -> ${h + 1} jumps from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("dtwDistance: a phase shift costs little under DTW, a level shift costs its area") {
    val df = Seq((
      Seq(0.0, 0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 0.0, 1.0, 0.0),
      Seq(2.0, 2.0, 3.0, 2.0, 2.0))).toDF("a", "b", "c")
    val got = df.select(
      Trend.dtwDistance(col("a"), col("b")).as("shift"),
      Trend.dtwDistance(col("a"), col("c")).as("level"),
      Trend.dtwDistance(col("a"), col("a")).as("self")).collect()(0)
    assert(got.getAs[Double]("self") == 0.0)
    assert(got.getAs[Double]("shift") == 0.0, "DTW warps the one-step phase shift away")
    assert(got.getAs[Double]("level") == 10.0, "constant +2 over 5 aligned points")
  }

  test("krippendorffAlpha: perfect agreement is 1; single-rating units drop") {
    val perfect = Seq(("g", 1L, "a"), ("g", 1L, "a"), ("g", 2L, "b"), ("g", 2L, "b"),
      ("g", 3L, "a")).toDF("g", "u", "c")
    val got = Evaluation.krippendorffAlpha(perfect, Seq("g"), "u", "c").collect()(0)
    assert(got.getAs[Long]("n_units") == 2L, "the singleton unit 3 is not pairable")
    assert(got.getAs[Long]("n_pairable") == 4L)
    assert(got.getAs[Double]("alpha") == 1.0)
  }

  test("krippendorffAlpha: the textbook half-agreement case lands at 0") {
    // units (a,a) and (a,b): Do = 0.5, De = 0.5 -> alpha = 0
    val df = Seq(("g", 1L, "a"), ("g", 1L, "a"), ("g", 2L, "a"), ("g", 2L, "b"))
      .toDF("g", "u", "c")
    assert(Evaluation.krippendorffAlpha(df, Seq("g"), "u", "c")
      .collect()(0).getAs[Double]("alpha") == 0.0)
  }

  test("negativeBinomialFit: overdispersed counts fit r/p; Poisson-like is NULL") {
    // mean 2, var 8/3 (> mean): r = mean²/(var-mean) = 4/(8/3-2) = 6,
    // p = r/(r+mean) = 6/(6+2) = 0.75
    val over = Seq(0.0, 0.0, 2.0, 2.0, 4.0, 4.0).map(("g", _)).toDF("g", "k")
    val got = Stats.negativeBinomialFit(over, Seq("g"), "k").collect()(0)
    assert(got.getAs[Double]("mean") == 2.0)
    assert(math.abs(got.getAs[Double]("variance") - 2.666667) < 2e-6)
    assert(math.abs(got.getAs[Double]("r") - 6.0) < 2e-5)
    val under = Seq(2.0, 2.0, 2.0).map(("g", _)).toDF("g", "k")
    val r2 = Stats.negativeBinomialFit(under, Seq("g"), "k").collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("r")), "no overdispersion -> no NB model")
  }

  test("logNormalFit: exact on a two-point log scale; non-positives counted") {
    // values e^0 and e^2: mu = 1, sigma = 1, median e, p95 = e^(1+1.6449)
    val df = Seq(("g", 1.0), ("g", math.exp(2.0)), ("g", -3.0)).toDF("g", "v")
    val got = Stats.logNormalFit(df, Seq("g"), "v").collect()(0)
    assert(got.getAs[Long]("n") == 2L && got.getAs[Long]("n_dropped") == 1L)
    assert(got.getAs[Double]("mu") == 1.0 && got.getAs[Double]("sigma") == 1.0)
    assert(math.abs(got.getAs[Double]("median_fit") - math.E) < 1e-5)
  }

  test("fieldHealth: parse rate splits null payloads from missing fields") {
    val df = Seq(
      ("a", """{"k": 10}"""), ("a", """{"k": 20}"""),
      ("a", """{"other": 1}"""), ("a", null.asInstanceOf[String]),
      ("a", "not json")).toDF("g", "props")
    val got = Json.fieldHealth(df, Seq("g"), "props", "$.k").collect()(0)
    assert(got.getAs[Long]("n") == 5L)
    assert(got.getAs[Long]("n_null_payload") == 1L)
    assert(got.getAs[Long]("n_field") == 2L)
    assert(got.getAs[Double]("present_rate") == 0.4)
    assert(got.getAs[Double]("field_mean") == 15.0)
    assert(got.getAs[Double]("field_min") == 10.0 && got.getAs[Double]("field_max") == 20.0)
  }
}
