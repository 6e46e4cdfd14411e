package graft

import graft.ann.Similarity
import graft.operators.{Evaluation, Hypothesis, Stats}
import graft.pipeline.Sampling
import org.apache.spark.sql.functions._

/** Round-6 batch: KS / Mann-Whitney two-sample tests, autocorrelation,
  * temperature mixture weights, hard-negative mining.
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------------- KS test

  test("ksTest: identical samples give d = 0, disjoint samples give d = 1") {
    val same = (1 to 20).flatMap(i => Seq(("g", i.toDouble, 0L), ("g", i.toDouble, 1L)))
      .toDF("k", "v", "arm")
    val r0 = Hypothesis.ksTest(same, Seq("k"), "v", col("arm") === 0).collect()(0)
    assert(r0.getAs[Long]("n_a") == 20L && r0.getAs[Long]("n_b") == 20L)
    assert(r0.getAs[Double]("d") == 0.0, "identical ECDFs")
    val split = ((1 to 10).map(i => ("g", i.toDouble, 0L)) ++
      (11 to 20).map(i => ("g", i.toDouble, 1L))).toDF("k", "v", "arm")
    val r1 = Hypothesis.ksTest(split, Seq("k"), "v", col("arm") === 0).collect()(0)
    assert(r1.getAs[Double]("d") == 1.0, "A entirely below B separates the ECDFs fully")
    assert(math.abs(r1.getAs[Double]("ks") - math.sqrt(100.0 / 20.0)) < 1e-12)
  }

  test("ksTest: hand-computed mid-shift, empty arm yields NULL d") {
    // A = {1,2,3,4}, B = {3,4,5,6}: ECDF gap peaks at x=2 (2/4 - 0) = 0.5
    val df = (Seq(1, 2, 3, 4).map(v => ("g", v.toDouble, 0L)) ++
      Seq(3, 4, 5, 6).map(v => ("g", v.toDouble, 1L)) ++
      Seq(("h", 1.0, 1L))).toDF("k", "v", "arm") // h: no A rows at all
    val out = Hypothesis.ksTest(df, Seq("k"), "v", col("arm") === 0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getAs[Double]("d") == 0.5)
    assert(out("h").isNullAt(out("h").fieldIndex("d")), "empty arm -> NULL, not a dropped group")
  }

  // ----------------------------------------------------------- MannWhitney

  test("mannWhitney: textbook U and tie-corrected z") {
    // A = {1,2}, B = {3,4}: ranks 1,2 vs 3,4; U_A = 3 - 3 = 0
    val df = Seq(("g", 1.0, true), ("g", 2.0, true), ("g", 3.0, false), ("g", 4.0, false))
      .toDF("k", "v", "a")
    val r = Hypothesis.mannWhitney(df, Seq("k"), "v", col("a")).collect()(0)
    assert(r.getAs[Double]("u_a") == 0.0)
    // sigma2 = (4/12)*((5) - 0/(4*3)) = 5/3; z = (0 - 2)/sqrt(5/3)
    assert(math.abs(r.getAs[Double]("z") - (-2.0 / math.sqrt(5.0 / 3.0))) < 1e-12)
  }

  test("mannWhitney: all-tied values yield NULL z (zero variance)") {
    val df = Seq(("g", 5.0, true), ("g", 5.0, true), ("g", 5.0, false)).toDF("k", "v", "a")
    val r = Hypothesis.mannWhitney(df, Seq("k"), "v", col("a")).collect()(0)
    // ranks all 2.0 -> U_A = 4 - 3 = 1; sigma2 = (2/12)*(4 - 24/6) = 0 -> NULL z
    assert(r.getAs[Double]("u_a") == 1.0)
    assert(r.isNullAt(r.fieldIndex("z")))
    // all tied: a random A row beats a random B row exactly half the time
    assert(r.getAs[Double]("delta") == 0.0, "Cliff's delta 2*1/(2*1) - 1 = 0")
  }

  test("mannWhitney: Cliff's delta hits the -1/+1 extremes on separated samples") {
    val df = Seq(("g", 1.0, true), ("g", 2.0, true), ("g", 3.0, false), ("g", 4.0, false))
      .toDF("k", "v", "a")
    val r = Hypothesis.mannWhitney(df, Seq("k"), "v", col("a")).collect()(0)
    assert(r.getAs[Double]("delta") == -1.0, "A always below B")
  }

  // --------------------------------------------------------- twoProportionZ

  test("twoProportionZ: textbook pooled z, equal rates give 0, degenerate pools NULL") {
    // A: 6/10 hit, B: 4/10 hit; pooled 0.5 -> z = 0.2/sqrt(0.25*0.2)
    val rows = (Seq.fill(6)((true, true)) ++ Seq.fill(4)((true, false)) ++
      Seq.fill(4)((false, true)) ++ Seq.fill(6)((false, false)))
      .map { case (a, h) => ("g", a, h) }
    val r = Hypothesis.twoProportionZ(rows.toDF("grp", "a", "h"), Seq("grp"),
      col("h"), col("a")).collect()(0)
    assert(r.getAs[Long]("k_a") == 6L && r.getAs[Long]("k_b") == 4L)
    assert(math.abs(r.getAs[Double]("z") - 0.2 / math.sqrt(0.25 * 0.2)) < 1e-12)
    // identical rates -> z exactly 0
    val same = Seq(("g", true, true), ("g", true, false), ("g", false, true), ("g", false, false))
    val r2 = Hypothesis.twoProportionZ(same.toDF("grp", "a", "h"), Seq("grp"),
      col("h"), col("a")).collect()(0)
    assert(r2.getAs[Double]("z") == 0.0)
    // nobody hits -> pooled 0 -> NULL z, rates still reported
    val none = Seq(("g", true, false), ("g", false, false))
    val r3 = Hypothesis.twoProportionZ(none.toDF("grp", "a", "h"), Seq("grp"),
      col("h"), col("a")).collect()(0)
    assert(r3.getAs[Double]("p_a") == 0.0 && r3.isNullAt(r3.fieldIndex("z")))
  }

  // ------------------------------------------------------------------- ACF

  test("acf: alternating series has acf(1) = -1, acf(2) = +1") {
    val rows = (1 to 20).map(t => ("u", t.toLong, t.toLong, if (t % 2 == 0) 1.0 else -1.0))
    val out = Stats.acf(rows.toDF("k", "t", "tie", "v"), Seq("k"), "t", "tie", "v", maxLag = 2)
      .collect().map(r => r.getAs[Int]("lag") -> r.getAs[Double]("acf")).toMap
    assert(math.abs(out(1) - (-1.0)) < 1e-9, s"perfect alternation: $out")
    assert(math.abs(out(2) - 1.0) < 1e-9)
  }

  test("acf: n per lag shrinks by lag and constant series is NULL") {
    val rows = (1 to 10).map(t => ("c", t.toLong, t.toLong, 7.0))
    val out = Stats.acf(rows.toDF("k", "t", "tie", "v"), Seq("k"), "t", "tie", "v", maxLag = 3)
      .collect().map(r => r.getAs[Int]("lag") -> r).toMap
    (1 to 3).foreach { k =>
      assert(out(k).getAs[Long]("n") == (10 - k).toLong, s"lag $k pairs")
      assert(out(k).isNullAt(out(k).fieldIndex("acf")), "zero variance -> NULL")
    }
  }

  // ---------------------------------------------------- temperatureWeights

  test("temperatureWeights: sqrt rebalancing upsamples the tail, epochs flag repeats") {
    val df = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).zipWithIndex
      .map { case (s, i) => (s, 100L, i.toLong) }.toDF("src", "sz", "id")
    val out = Sampling.temperatureWeights(df, "src", "sz", alpha = 0.5)
      .collect().map(r => r.getString(0) -> r).toMap
    val wBig = out("big").getAs[Double]("weight")
    val wSmall = out("small").getAs[Double]("weight")
    assert(math.abs(wBig + wSmall - 1.0) < 1e-9, "weights normalize")
    // proportional would give 0.9/0.1; sqrt gives 3:1 instead of 9:1
    assert(math.abs(wBig / wSmall - 3.0) < 1e-6, s"sqrt(9000)/sqrt(1000) = 3: $wBig/$wSmall")
    // small source: weight 0.25 of a 10k-size budget over 1k rows -> 2.5 epochs
    assert(math.abs(out("small").getAs[Double]("epochs") - 2.5) < 1e-6)
    assert(out("big").getAs[Long]("n_rows") == 90L)
  }

  // --------------------------------------------------------- hardNegatives

  test("hardNegatives: band excludes near-duplicates and anti-correlated vectors") {
    // q = (1,0); dup = (1,0) cos 1; mid = (1,1)/~ cos .707... band [0.2, 0.9)
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0.001f)), (2L, Array(1f, 1f)),
      (3L, Array(0.5f, 1f)), (4L, Array(-1f, 0f)), (5L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.hardNegatives(vecs, vecs.filter(col("vec_id") === 0), k = 5,
        lo = 0.2, hi = 0.9)
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Int]("rank")).toMap
    assert(!out.contains(1L), "near-duplicate above hi is excluded")
    assert(!out.contains(4L) && !out.contains(5L), "orthogonal/opposite below lo excluded")
    assert(out(2L) == 1 && out(3L) == 2, s"in-band ranked by cosine: $out")
  }

  test("hardNegatives: queries with an empty band emit no rows") {
    val vecs = Seq((0L, Array(1f, 0f)), (1L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.hardNegatives(vecs, vecs.filter(col("vec_id") === 0), k = 3,
      lo = 0.2, hi = 0.9)
    assert(out.count() == 0L)
  }

  // ------------------------------------------------------------ cohenKappa

  test("cohenKappa: perfect agreement 1, marginal-luck agreement 0, textbook mid-case") {
    val perfect = Seq(("g", "x", "x"), ("g", "y", "y")).toDF("k", "a", "b")
    val r1 = Stats.cohenKappa(perfect, Seq("k"), "a", "b").collect()(0)
    assert(r1.getAs[Double]("kappa") == 1.0)
    // independent labels at 50/50: po = pe = 0.5 -> kappa 0
    val indep = Seq(("g", "x", "x"), ("g", "x", "y"), ("g", "y", "x"), ("g", "y", "y"))
      .toDF("k", "a", "b")
    val r2 = Stats.cohenKappa(indep, Seq("k"), "a", "b").collect()(0)
    assert(r2.getAs[Double]("po") == 0.5 && r2.getAs[Double]("pe") == 0.5)
    assert(r2.getAs[Double]("kappa") == 0.0)
    // classic 2x2: diag 20+15 of 50, marginals A(25,25) B(30,20)
    val rows = Seq.fill(20)(("g", "x", "x")) ++ Seq.fill(5)(("g", "x", "y")) ++
      Seq.fill(10)(("g", "y", "x")) ++ Seq.fill(15)(("g", "y", "y"))
    val r3 = Stats.cohenKappa(rows.toDF("k", "a", "b"), Seq("k"), "a", "b").collect()(0)
    assert(math.abs(r3.getAs[Double]("kappa") - 0.4) < 1e-12, "po .7, pe .5 -> kappa .4")
  }

  test("cohenKappa: both sides constant gives NULL (vacuous agreement), disjoint labels pe 0") {
    val const = Seq(("g", "x", "x"), ("g", "x", "x")).toDF("k", "a", "b")
    val r = Stats.cohenKappa(const, Seq("k"), "a", "b").collect()(0)
    assert(r.isNullAt(r.fieldIndex("kappa")), "pe = 1 -> NULL not division blowup")
    val disjoint = Seq(("g", "x", "y"), ("g", "x", "y")).toDF("k", "a", "b")
    val r2 = Stats.cohenKappa(disjoint, Seq("k"), "a", "b").collect()(0)
    assert(r2.getAs[Double]("pe") == 0.0 && r2.getAs[Double]("kappa") == 0.0,
      "non-overlapping label sets survive the marginal join as pe 0")
  }

  // -------------------------------------------------------- wilsonInterval

  test("wilsonInterval: brackets p, stays in [0,1] at the extremes") {
    val df = (Seq.fill(8)(("g", true)) ++ Seq.fill(2)(("g", false)) ++
      Seq.fill(5)(("h", true)) ++ Seq.fill(3)(("z", false))).toDF("grp", "hit")
    val out = Stats.wilsonInterval(df, Seq("grp"), col("hit")).collect()
      .map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getAs[Long]("n") == 10L && g.getAs[Long]("k") == 8L)
    assert(g.getAs[Double]("lo") < 0.8 && 0.8 < g.getAs[Double]("hi"))
    assert(g.getAs[Double]("lo") > 0.0 && g.getAs[Double]("hi") < 1.0)
    // p = 1: naive CI would be [1, 1]; Wilson pulls lo below 1, caps hi at 1
    val h = out("h")
    assert(h.getAs[Double]("p") == 1.0 && h.getAs[Double]("lo") < 1.0)
    assert(h.getAs[Double]("hi") <= 1.0 + 1e-12)
    val z = out("z")
    assert(z.getAs[Double]("p") == 0.0 && z.getAs[Double]("hi") > 0.0)
    assert(z.getAs[Double]("lo") >= -1e-12)
  }

  // -------------------------------------------------------------- coverage

  test("coverage: per-doc OOV counts against an explicit vocab; empty docs absent") {
    val vocab = Seq(("known", 1L), ("words", 2L)).toDF("word", "word_id")
    val docs = Seq((1L, "known words here"), (2L, "known known"), (3L, "???")).toDF("id", "text")
    val out = graft.text.WordVocab.coverage(docs, "id", "text", vocab)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Long]("n_tokens") == 3L && out(1L).getAs[Long]("n_oov") == 1L)
    assert(math.abs(out(1L).getAs[Double]("oov_rate") - 1.0 / 3.0) < 1e-12)
    assert(out(2L).getAs[Long]("n_oov") == 0L)
    assert(!out.contains(3L), "no [a-z] tokens -> absent, not zero-division")
  }

  // ---------------------------------------------------------------- rocAuc

  test("rocAuc: perfect separation 1.0, reversed 0.0, all-tied 0.5, empty arm NULL") {
    val perfect = (Seq(3.0, 4.0).map(("g", _, true)) ++ Seq(1.0, 2.0).map(("g", _, false)))
      .toDF("k", "s", "y")
    val p = Evaluation.rocAuc(perfect, Seq("k"), "s", col("y")).collect()(0)
    assert(p.getAs[Long]("n_pos") == 2L && p.getAs[Long]("n_neg") == 2L)
    assert(p.getAs[Double]("auc") == 1.0)
    val rev = Evaluation.rocAuc(perfect, Seq("k"), "s", !col("y")).collect()(0)
    assert(rev.getAs[Double]("auc") == 0.0)
    val tied = Seq(("g", 5.0, true), ("g", 5.0, false)).toDF("k", "s", "y")
    assert(Evaluation.rocAuc(tied, Seq("k"), "s", col("y")).collect()(0)
      .getAs[Double]("auc") == 0.5, "tie counts half — the P(s+ > s-) + P(tie)/2 identity")
    val onearm = Seq(("g", 1.0, true), ("g", 2.0, true)).toDF("k", "s", "y")
    val o = Evaluation.rocAuc(onearm, Seq("k"), "s", col("y")).collect()(0)
    assert(o.isNullAt(o.fieldIndex("auc")), "no negatives -> NULL, not a dropped slice")
  }

  test("rocAuc: hand-computed interleaved case") {
    // pos scores {2, 4}, neg {1, 3}: pairs (2>1), (2<3), (4>1), (4>3) -> 3/4
    val df = Seq(("g", 2.0, true), ("g", 4.0, true), ("g", 1.0, false), ("g", 3.0, false))
      .toDF("k", "s", "y")
    assert(Evaluation.rocAuc(df, Seq("k"), "s", col("y")).collect()(0)
      .getAs[Double]("auc") == 0.75)
  }

  // ----------------------------------------------------------- calibration

  test("calibration: bin means, rates, and the weighted ECE") {
    // bin 1: scores .10/.15, 1 of 2 positive; bin 9: score .95, positive
    val df = Seq(("g", 0.10, true), ("g", 0.15, false), ("g", 0.95, true))
      .toDF("k", "s", "y")
    val out = Evaluation.calibration(df, Seq("k"), "s", col("y"), nBins = 10)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(out.keySet == Set(1L, 9L), "empty bins are absent, not zero rows")
    val b1 = out(1L)
    assert(b1.getAs[Long]("n") == 2L)
    assert(math.abs(b1.getAs[Double]("conf") - 0.125) < 1e-9)
    assert(b1.getAs[Double]("acc") == 0.5)
    // ECE = (2*|0.5-0.125| + 1*|1.0-0.95|) / 3
    val ece = (2.0 * 0.375 + 1.0 * 0.05) / 3.0
    assert(math.abs(b1.getAs[Double]("ece") - ece) < 1e-6)
    assert(math.abs(out(9L).getAs[Double]("ece") - ece) < 1e-6, "group ECE repeats on every bin row")
  }

  test("calibration: out-of-range scores clamp into the edge bins") {
    val df = Seq(("g", -0.2, false), ("g", 1.7, true)).toDF("k", "s", "y")
    val bins = Evaluation.calibration(df, Seq("k"), "s", col("y")).collect()
      .map(_.getAs[Long]("bin")).sorted
    assert(bins.toSeq == Seq(0L, 9L))
  }

  // --------------------------------------------------------- kruskalWallis

  test("kruskalWallis: textbook three-arm H; degenerate groups NULL") {
    // arms {1,2}, {3,4}, {5,6}: rank sums 3, 7, 11; H = 12/(6*7)*(9/2+49/2+121/2) - 21
    val df = (Seq(1.0, 2.0).map(("g", "a", _)) ++ Seq(3.0, 4.0).map(("g", "b", _)) ++
      Seq(5.0, 6.0).map(("g", "c", _)) ++ Seq(("h", "a", 1.0), ("h", "a", 2.0)) ++
      Seq(("z", "a", 7.0), ("z", "b", 7.0))).toDF("k", "arm", "v")
    val out = Hypothesis.kruskalWallis(df, Seq("k"), "arm", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getAs[Long]("n") == 6L && g.getAs[Long]("k_arms") == 3L)
    val h = 12.0 / 42.0 * (4.5 + 24.5 + 60.5) - 21.0
    assert(math.abs(g.getAs[Double]("h") - h) < 1e-6)
    assert(out("h").isNullAt(out("h").fieldIndex("h")), "one arm -> nothing to compare")
    assert(out("z").isNullAt(out("z").fieldIndex("h")), "all values tied -> C = 0 -> NULL")
  }

  test("kruskalWallis: k=2 with no ties matches mannWhitney's z squared (H = z^2)") {
    val df = Seq(("g", "a", 1.0), ("g", "a", 4.0), ("g", "b", 2.0), ("g", "b", 6.0),
      ("g", "b", 8.0)).toDF("k", "arm", "v")
    val h = Hypothesis.kruskalWallis(df, Seq("k"), "arm", "v").collect()(0).getAs[Double]("h")
    val z = Hypothesis.mannWhitney(df, Seq("k"), "v", col("arm") === "a")
      .collect()(0).getAs[Double]("z")
    // without the continuity correction H equals the squared two-sample z
    // (up to the r6 rounding kruskalWallis applies to each R_a²/n_a term)
    assert(math.abs(h - z * z) < 1e-5)
  }

  // ---------------------------------------------------------- jsDivergence

  test("jsDivergence: bounded by ln 2, zero for an identical split, NULL for a total group") {
    import graft.text.Keywords
    // two sources with identical word distributions -> JS ~ 0 each
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("source", "text")
    Keywords.jsDivergence(same, "source").collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("js")) < 1e-12)
    }
    // disjoint vocabularies -> JS = ln 2 exactly
    val disj = Seq(("a", "x x y"), ("b", "p q q")).toDF("source", "text")
    Keywords.jsDivergence(disj, "source").collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("js") - math.log(2.0)) < 1e-9)
    }
    // a group that IS the whole corpus has no rest to compare against
    val solo = Seq(("a", "x y")).toDF("source", "text")
    val r = Keywords.jsDivergence(solo, "source").collect()(0)
    assert(r.isNullAt(r.fieldIndex("js")))
  }

  test("jsDivergence: absent-term closed form matches the explicit grid") {
    import graft.text.Keywords
    // P = {x: 2/3, y: 1/3}, Q = {x: 1/4, z: 3/4} (term y absent from Q, z from P)
    val df = Seq(("a", "x x y"), ("b", "x z z z")).toDF("source", "text")
    val out = Keywords.jsDivergence(df, "source").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("js")).toMap
    def kl2(p: Map[String, Double], m: Map[String, Double]): Double =
      p.collect { case (t, pv) if pv > 0 => pv * math.log(pv / m(t)) }.sum
    val p = Map("x" -> 2.0 / 3, "y" -> 1.0 / 3, "z" -> 0.0)
    val q = Map("x" -> 1.0 / 4, "y" -> 0.0, "z" -> 3.0 / 4)
    val m = p.map { case (t, pv) => t -> (pv + q(t)) / 2 }
    val js = kl2(p, m) / 2 + kl2(q, m) / 2
    assert(math.abs(out("a") - js) < 1e-9)
    assert(math.abs(out("b") - js) < 1e-9, "JS is symmetric")
  }
}
