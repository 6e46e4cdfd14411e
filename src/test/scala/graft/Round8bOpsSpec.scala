package graft

import graft.operators.{Integrity, Woe}
import org.apache.spark.sql.functions._

/** Round-8 batch B: WOE/IV feature screen and ε-DP count release. */
class Round8bOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ WOE / IV

  test("weightOfEvidence: hand-computed cells, WOE signs, IV total") {
    // feature f: bin "a" is 3 good / 1 bad, bin "b" is 1 good / 3 bad
    val df = Seq(
      ("a", true), ("a", true), ("a", true), ("a", false),
      ("b", true), ("b", false), ("b", false), ("b", false)
    ).toDF("f", "pos")
    val out = Woe.weightOfEvidence(df, Seq("f"), col("pos"), smoothing = 0.5)
      .collect().map(r => r.getAs[String]("bin") -> r).toMap
    val a = out("a"); val b = out("b")
    assert(a.getAs[Long]("n_good") == 3 && a.getAs[Long]("n_bad") == 1)
    assert(b.getAs[Long]("n_good") == 1 && b.getAs[Long]("n_bad") == 3)
    // pg(a)=3.5/5, pb(a)=1.5/5 -> woe = ln(7/3) > 0; bin b is the mirror
    val expA = math.log((3.5 / 5.0) / (1.5 / 5.0))
    assert(math.abs(a.getAs[Double]("woe") - expA) < 1e-5, s"woe(a)=${a.getAs[Double]("woe")}")
    assert(math.abs(a.getAs[Double]("woe") + b.getAs[Double]("woe")) < 1e-5,
      "symmetric design must give mirrored WOE")
    // IV identical on both rows of the feature and equals the term sum
    val iv = a.getAs[Double]("iv")
    assert(math.abs(iv - b.getAs[Double]("iv")) < 1e-12)
    val termSum = a.getAs[Double]("iv_term") + b.getAs[Double]("iv_term")
    assert(math.abs(iv - termSum) < 1e-6, s"iv=$iv termSum=$termSum")
    assert(iv > 0.0)
  }

  test("weightOfEvidence: zero cells stay finite; NULL feature is its own bin") {
    val df = Seq(
      (Some("a"), true), (Some("a"), true), (None, false), (None, false)
    ).toDF("f", "pos")
    val out = Woe.weightOfEvidence(df, Seq("f"), col("pos"))
      .collect().map(r => r.getAs[String]("bin") -> r).toMap
    assert(out.keySet == Set("a", "(null)"))
    // bin "a" has zero bad rows: smoothing keeps woe finite
    val w = out("a").getAs[Double]("woe")
    assert(!w.isInfinite && !w.isNaN, s"zero-cell woe must be finite, got $w")
  }

  test("weightOfEvidence: an uninformative feature has IV ~ 0") {
    // every bin has the same good:bad ratio
    val df = (0 until 40).map { i =>
      (if (i % 2 == 0) "x" else "y", i % 4 < 2)
    }.toDF("f", "pos")
    val iv = Woe.weightOfEvidence(df, Seq("f"), col("pos"))
      .select("iv").as[Double].head()
    assert(math.abs(iv) < 0.01, s"balanced bins must give IV~0, got $iv")
  }

  test("weightOfEvidence: multiple features melt into one frame") {
    val df = Seq(("a", "u", true), ("b", "v", false)).toDF("f1", "f2", "pos")
    val feats = Woe.weightOfEvidence(df, Seq("f1", "f2"), col("pos"))
      .select("feature").distinct().as[String].collect().toSet
    assert(feats == Set("f1", "f2"))
  }

  // ------------------------------------------------------- dpCounts (ε-DP)

  test("dpCounts: noise is deterministic, seed-dependent, and ~Laplace-scaled") {
    val df = (0 until 100).map(i => ("g" + (i % 4), i)).toDF("g", "x")
    val a = Integrity.dpCounts(df, Seq("g"), epsilon = 1.0, seed = "s1")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("noisy_count")).toMap
    val b = Integrity.dpCounts(df, Seq("g"), epsilon = 1.0, seed = "s1")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("noisy_count")).toMap
    assert(a == b, "same seed must reproduce the identical release")
    val c = Integrity.dpCounts(df, Seq("g"), epsilon = 1.0, seed = "s2")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("noisy_count")).toMap
    assert(a != c, "a different seed must draw different noise")
    // every group's true count is 25; ε=1 noise is rarely > 15 for 4 draws
    a.values.foreach(v => assert(math.abs(v - 25.0) < 15.0, s"noise implausibly large: $v"))
  }

  test("dpCounts: tighter epsilon means larger noise (same u, scaled by 1/ε)") {
    val df = (0 until 100).map(i => ("g" + (i % 4), i)).toDF("g", "x")
    val e1 = Integrity.dpCounts(df, Seq("g"), epsilon = 1.0, seed = "s1")
      .collect().map(r => r.getAs[String]("g") -> (r.getAs[Double]("noisy_count") - 25.0)).toMap
    val e01 = Integrity.dpCounts(df, Seq("g"), epsilon = 0.1, seed = "s1")
      .collect().map(r => r.getAs[String]("g") -> (r.getAs[Double]("noisy_count") - 25.0)).toMap
    e1.foreach { case (g, n1) =>
      assert(math.abs(e01(g) - 10.0 * n1) < 1e-3,
        s"ε=0.1 noise must be 10x the ε=1 draw for the same key: $g ${e01(g)} vs $n1")
    }
  }

  test("dpCounts: group-key hashing is delimiter-proof across columns") {
    // ("ab","c") and ("a","bc") must NOT share a noise draw
    val df = Seq(("ab", "c"), ("a", "bc")).toDF("x", "y")
    val out = Integrity.dpCounts(df, Seq("x", "y"), epsilon = 1.0, seed = "s")
      .collect().map(r => r.getAs[Double]("noisy_count")).toSet
    assert(out.size == 2, "per-column md5 must keep concatenated spellings distinct")
  }
}
