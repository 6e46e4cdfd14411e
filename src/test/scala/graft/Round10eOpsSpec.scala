package graft

import graft.operators.{Hypothesis, Stats}
import org.apache.spark.sql.functions._

/** Round-10 batch Y: Gumbel block-maxima fit, L-moments, Theil
  * decomposition, Cochran–Armitage trend, Storey q-values.
  */
class Round10eOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000L)
  private val day = 86400000000L

  test("gumbelFit: method-of-moments on two block maxima; one block is unfittable") {
    val ev = Seq(
      ("g", t(10), 10.0), ("g", t(20), 3.0), // block 0 max 10
      ("g", t(86410), 20.0), // block 1 max 20
      ("h", t(10), 5.0)) // single block
      .toDF("g", "ts", "v")
    val got = Stats.gumbelFit(ev, Seq("g"), "ts", "v", blockUs = day)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val g = got("g")
    assert(g.getAs[Long]("n_blocks") == 2L)
    assert(g.getAs[Double]("block_max_mean") == 15.0)
    assert(math.abs(g.getAs[Double]("beta") - 5.0 * 0.7796968012336793) < 2e-6)
    val beta = 5.0 * 0.7796968012336793
    val mu = 15.0 - 0.5772156649015329 * beta
    assert(math.abs(g.getAs[Double]("mu") - mu) < 2e-6)
    assert(math.abs(g.getAs[Double]("q_fit") - (mu - beta * math.log(-math.log(0.99)))) < 2e-5)
    assert(got("h").isNullAt(got("h").fieldIndex("mu")), "one block has no spread")
  }

  test("lMoments: uniform 1..5 has l2 = 1, symmetric shape") {
    val df = (1 to 5).map(v => ("g", v.toDouble)).toDF("g", "v")
    val got = Stats.lMoments(df, Seq("g"), "v").collect()(0)
    assert(got.getAs[Double]("l1") == 3.0)
    assert(got.getAs[Double]("l2") == 1.0)
    assert(math.abs(got.getAs[Double]("l_cv") - 0.333333) < 2e-6)
    assert(got.getAs[Double]("l_skew") == 0.0, "a symmetric sample has zero L-skewness")
  }

  test("theilDecomposition: singleton groups put ALL inequality between") {
    val df = Seq(("a", 1.0), ("b", 3.0), ("c", -1.0)).toDF("g", "v")
    val got = Stats.theilDecomposition(df, "g", "v").collect()(0)
    assert(got.getAs[Long]("n") == 2L && got.getAs[Long]("n_dropped") == 1L)
    val tot = got.getAs[Double]("theil_total")
    val expected = 0.5 * (0.5 * math.log(0.5) + 1.5 * math.log(1.5))
    assert(math.abs(tot - expected) < 2e-6)
    assert(got.getAs[Double]("theil_within") == 0.0)
    assert(got.getAs[Double]("theil_between") == tot)
  }

  test("theilDecomposition: a perfectly equal corpus measures zero") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val got = Stats.theilDecomposition(df, "g", "v").collect()(0)
    assert(got.getAs[Double]("theil_total") == 0.0)
  }

  test("cochranArmitage: a monotone dose-response scores a large positive z; flat is 0") {
    val rows = (0 until 20).map(i => ("g", 0.0, false)) ++
      (0 until 20).map(i => ("g", 1.0, i < 10)) ++
      (0 until 20).map(i => ("g", 2.0, true))
    val got = Hypothesis.cochranArmitage(rows.toDF("g", "dose", "hit"),
      Seq("g"), "dose", col("hit")).collect()(0)
    assert(got.getAs[Long]("k_levels") == 3L)
    assert(got.getAs[Double]("z") > 5.0)
    assert(got.getAs[Double]("p_value") < 0.001)
    val flat = (0 until 30).map(i => ("g", (i % 3).toDouble, i % 2 == 0))
    val z2 = Hypothesis.cochranArmitage(flat.toDF("g", "dose", "hit"),
      Seq("g"), "dose", col("hit")).collect()(0).getAs[Double]("z")
    assert(z2 == 0.0)
  }

  test("storeyQValues: pi0 scales BH's q-values; NULLs ride through") {
    val tests = Seq(("t1", Some(0.01)), ("t2", Some(0.02)),
      ("t3", Some(0.6)), ("t4", None)).toDF("t", "p")
    val got = Hypothesis.storeyQValues(tests, "p", Seq("t"), lambda = 0.5, alpha = 0.05)
      .collect().map(r => r.getAs[String]("t") -> r).toMap
    assert(math.abs(got("t1").getAs[Double]("pi0") - 0.666667) < 2e-6)
    assert(math.abs(got("t1").getAs[Double]("q_storey") - 0.02) < 2e-6,
      "pi0 * BH q = 2/3 * 0.03")
    assert(got("t1").getAs[Boolean]("reject"))
    assert(got("t4").isNullAt(got("t4").fieldIndex("q_storey")))
  }
}
