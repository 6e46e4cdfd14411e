package graft

import graft.operators.{FuzzyJoin, Stats, TargetEncode}
import graft.text.RetrievalEval
import org.apache.spark.sql.functions._

/** Round-6 eighth batch: 1-D earth-mover drift, Fellegi–Sunter weights. */
class Round6hOpsSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------------- emd1d

  test("emd1d: identical halves score 0; shifted mass scores the distance") {
    // pair construction: ids (2k-1, 2k) share a value, so the even/odd
    // halves carry identical multisets
    val same = (1 to 40).map(i => ("g", i.toLong, ((i + 1) / 2 % 10).toDouble))
    val r0 = Stats.emd1d(same.toDF("g", "id", "x"), Seq("g"), "x",
      isRef = col("id") % 2 === 0, nBins = 10).collect().head
    assert(r0.getAs[Long]("n_ref") == 20L && r0.getAs[Long]("n_cur") == 20L)
    assert(math.abs(r0.getAs[Double]("emd")) < 1e-9, "same distribution, zero distance")
    // ref at 0, cur at 10, 2 bins: |cum| = 1 on the first bin, width 5
    val shift = (1 to 10).map(i => ("g", i.toLong, if (i % 2 == 0) 0.0 else 10.0))
    val r1 = Stats.emd1d(shift.toDF("g", "id", "x"), Seq("g"), "x",
      isRef = col("id") % 2 === 0, nBins = 2).collect().head
    assert(math.abs(r1.getAs[Double]("emd") - 5.0) < 1e-9,
      "one bin of mass moved across one 5-wide bin")
  }

  test("emd1d: missing side is NULL, constant group is 0") {
    val oneSide = (1 to 10).map(i => ("g", i.toLong, i.toDouble))
    val r = Stats.emd1d(oneSide.toDF("g", "id", "x"), Seq("g"), "x",
      isRef = lit(true), nBins = 4).collect().head
    assert(r.isNullAt(r.fieldIndex("n_cur")) && r.isNullAt(r.fieldIndex("emd")))
    val const = (1 to 10).map(i => ("g", i.toLong, 7.0))
    val rc = Stats.emd1d(const.toDF("g", "id", "x"), Seq("g"), "x",
      isRef = col("id") % 2 === 0, nBins = 4).collect().head
    assert(rc.getAs[Double]("emd") == 0.0, "no range, no movement")
  }

  test("emd1d: farther moves cost more than near moves") {
    def emdOf(curVal: Double): Double = {
      val rows = (1 to 10).map(i => ("g", i.toLong, if (i % 2 == 0) 0.0 else curVal)) :+
        (("g", 11L, 10.0)) // pin the range to [0, 10] on the ref side
      Stats.emd1d(rows.toDF("g", "id", "x"), Seq("g"), "x",
        isRef = col("id") % 2 === 0 || col("id") === 11L, nBins = 10)
        .collect().head.getAs[Double]("emd")
    }
    assert(emdOf(9.0) > emdOf(3.0), "mass moved farther costs more")
  }

  // --------------------------------------------------------- fellegiSunter

  private val fsRecords = Seq(
    (1L, "ny", 10L), (2L, "ny", 10L), (3L, "ny", 20L), (4L, "sf", null.asInstanceOf[Any])
  ).map { case (i, c, b) => (i, c, if (b == null) None else Some(b.asInstanceOf[Long])) }
    .toDF("id", "city", "bucket")

  test("fellegiSunter: rare-field agreement outweighs common-field agreement") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = FuzzyJoin.fellegiSunter(fsRecords, "id", pairs, Seq("city", "bucket"))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r).toMap
    // u_city = (3^2 + 1^2)/16 = 0.625; u_bucket over 3 non-null = (4+1)/16
    val uc = 10.0 / 16.0
    val ub = 5.0 / 16.0
    def w(agree: Boolean, u: Double): Double =
      if (agree) math.log(0.9 / u) / math.log(2.0)
      else math.log((1.0 - 0.9) / (1.0 - u)) / math.log(2.0)
    // (1,2): both agree
    val r12 = out((1L, 2L))
    assert(r12.getAs[Long]("n_agree") == 2L)
    assert(math.abs(r12.getAs[Double]("weight") - (w(true, uc) + w(true, ub))) < 1e-12)
    // (1,3): city agrees, bucket disagrees
    val r13 = out((1L, 3L))
    assert(r13.getAs[Long]("n_agree") == 1L)
    assert(math.abs(r13.getAs[Double]("weight") - (w(true, uc) + w(false, ub))) < 1e-12)
    // (1,4): city disagrees, bucket NULL on one side -> neutral 0
    val r14 = out((1L, 4L))
    assert(r14.getAs[Long]("n_agree") == 0L)
    assert(math.abs(r14.getAs[Double]("weight") - w(false, uc)) < 1e-12)
    // the rare bucket agreement is worth more than the common city one
    assert(w(true, ub) > w(true, uc))
  }

  test("fellegiSunter: degenerate inputs are rejected") {
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      FuzzyJoin.fellegiSunter(fsRecords, "id", pairs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.fellegiSunter(fsRecords, "id", pairs, Seq("city"), m = 1.0)
    }
  }

  // ------------------------------------------------------------------- rbo

  private def ranking(items: Seq[Long]) =
    items.zipWithIndex.map { case (id, i) => ("q1", id, (i + 1).toLong) }
      .toDF("query", "id", "rank")

  test("rbo: identical rankings score 1, disjoint score 0") {
    val a = ranking(1L to 10L)
    val same = RetrievalEval.rbo(a, ranking(1L to 10L), "query", "id", "rank", k = 10)
      .collect().head
    // truncated RBO_min of identical lists: (1-p)/p * sum p^d = 1 - p^k
    assert(math.abs(same.getAs[Double]("rbo") - (1.0 - math.pow(0.9, 10))) < 1e-6)
    assert(same.getAs[Double]("overlap_k") == 1.0)
    val disjoint = RetrievalEval.rbo(a, ranking(11L to 20L), "query", "id", "rank", 10)
      .collect().head
    assert(disjoint.getAs[Double]("rbo") == 0.0 && disjoint.getAs[Double]("overlap_k") == 0.0)
  }

  test("rbo: top-weighted — agreement at rank 1 beats agreement at rank 10") {
    val a = ranking(1L to 10L)
    // b1 shares only item 1 (at rank 1); b2 shares only item 10 (at rank 10)
    val b1 = ranking(1L +: (21L to 29L))
    val b2 = ranking((21L to 29L) :+ 10L)
    val r1 = RetrievalEval.rbo(a, b1, "query", "id", "rank", 10).collect().head
    val r2 = RetrievalEval.rbo(a, b2, "query", "id", "rank", 10).collect().head
    assert(r1.getAs[Double]("overlap_k") == r2.getAs[Double]("overlap_k"))
    assert(r1.getAs[Double]("rbo") > r2.getAs[Double]("rbo"), "early overlap weighs more")
  }

  test("rbo: hand-computed two-item example") {
    // a = [1,2], b = [2,1], k=2: X_1 = 0, X_2 = 2
    // rbo = (1-p)/p * (p^2 * 2/2) = (1-p) * p
    val r = RetrievalEval.rbo(ranking(Seq(1L, 2L)), ranking(Seq(2L, 1L)),
      "query", "id", "rank", k = 2).collect().head
    assert(math.abs(r.getAs[Double]("rbo") - 0.1 * 0.9) < 1e-6)
  }

  test("rbo: a query present in only one ranking reports 0, not NULL") {
    val a = ranking(1L to 3L)
    val b = Seq(("q2", 7L, 1L)).toDF("query", "id", "rank")
    val out = RetrievalEval.rbo(a, b, "query", "id", "rank", k = 3)
      .collect().map(r => r.getAs[String]("query") -> r).toMap
    assert(out("q1").getAs[Long]("n_a") == 3L && out("q1").getAs[Long]("n_b") == 0L)
    assert(out("q2").getAs[Long]("n_a") == 0L && out("q2").getAs[Long]("n_b") == 1L)
  }

  // -------------------------------------------------------------- theilsU

  test("theilsU: determinism, independence, and asymmetry") {
    // y fully determined by x: U(y|x) = 1
    val det = (1 to 60).map(i => ("g", s"x${i % 3}", s"y${i % 3}")).toDF("g", "x", "y")
    val rd = Stats.theilsU(det, Seq("g"), "x", "y").collect().head
    assert(math.abs(rd.getAs[Double]("u") - 1.0) < 1e-5)
    // independent uniform x and y: U ~ 0
    val ind = (0 until 120).map(i => ("g", s"x${i % 3}", s"y${(i / 3) % 4}")).toDF("g", "x", "y")
    val ri = Stats.theilsU(ind, Seq("g"), "x", "y").collect().head
    assert(math.abs(ri.getAs[Double]("u")) < 1e-5, s"independent -> 0, got $ri")
    // asymmetric: x has 4 levels refining y's 2 -> U(y|x)=1 but U(x|y)<1
    val asym = (0 until 80).map(i => ("g", s"x${i % 4}", s"y${i % 2}")).toDF("g", "x", "y")
    val yx = Stats.theilsU(asym, Seq("g"), "x", "y").collect().head.getAs[Double]("u")
    val xy = Stats.theilsU(asym, Seq("g"), "y", "x").collect().head.getAs[Double]("u")
    assert(math.abs(yx - 1.0) < 1e-5 && xy < 0.6, s"U(y|x)=$yx U(x|y)=$xy")
    // single y level: H(Y)=0 -> NULL
    val one = (1 to 10).map(i => ("g", s"x$i", "only")).toDF("g", "x", "y")
    val ro = Stats.theilsU(one, Seq("g"), "x", "y").collect().head
    assert(ro.isNullAt(ro.fieldIndex("u")))
  }

  // --------------------------------------------------------- targetEncode

  test("targetEncode: LOO excludes the row, smoothing rescues singletons") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 4L, 100.0) // singleton
    ).toDF("cat", "id", "y")
    // pure LOO: row 1 gets mean(20,30) = 25; singleton has no peers -> NULL
    val loo = TargetEncode.leaveOneOut(df, "cat", "y", smoothing = 0.0)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(math.abs(loo(1L).getAs[Double]("enc") - 25.0) < 1e-6)
    assert(math.abs(loo(3L).getAs[Double]("enc") - 15.0) < 1e-6)
    assert(loo(4L).isNullAt(loo(4L).fieldIndex("enc")))
    // smoothing m=2: global mean 40; singleton -> (0 + 2*40)/(0+2) = 40
    val sm = TargetEncode.leaveOneOut(df, "cat", "y", smoothing = 2.0)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(math.abs(sm(4L).getAs[Double]("enc") - 40.0) < 1e-6)
    // and the encoding never equals the naive category mean for members
    assert(math.abs(sm(1L).getAs[Double]("enc") - 20.0) > 1.0, "no self-leak")
  }

  test("targetEncode: NULL category or target rows emit NULL enc") {
    val df = Seq(
      (Some("a"), 1L, Some(1.0)), (Some("a"), 2L, Some(3.0)),
      (None, 3L, Some(9.0)), (Some("a"), 4L, None)
    ).toDF("cat", "id", "y")
    val out = TargetEncode.leaveOneOut(df, "cat", "y")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(math.abs(out(1L).getAs[Double]("enc") - 3.0) < 1e-6)
    assert(out(3L).isNullAt(out(3L).fieldIndex("enc")))
    assert(out(4L).isNullAt(out(4L).fieldIndex("enc")))
  }

  // -------------------------------------------------------- powerAnalysis

  test("powerAnalysis: textbook n, scaling with variance and effect") {
    // sd=10, mean=100, 5% effect (delta=5): n = 2*100*7.849/25 ~ 62.8 -> 63
    val rows = (1 to 200).map(i => ("g", 100.0 + (if (i % 2 == 0) 10.0 else -10.0)))
    val r = Stats.powerAnalysis(rows.toDF("g", "v"), Seq("g"), "v").collect().head
    assert(r.getAs[Long]("n") == 200L)
    assert(math.abs(r.getAs[Double]("mean") - 100.0) < 1e-6)
    val sd = r.getAs[Double]("sd")
    val expect = math.ceil(2.0 * math.pow(1.959963984540054 + 0.8416212335729143, 2)
      * sd * sd / 25.0).toLong
    assert(r.getAs[Long]("n_required") == expect)
    // quadruple the effect -> quarter^2 = 1/16 the n (ceil-rounded)
    val r4 = Stats.powerAnalysis(rows.toDF("g", "v"), Seq("g"), "v", relEffect = 0.2)
      .collect().head
    assert(r4.getAs[Long]("n_required") < r.getAs[Long]("n_required") / 10)
    // constant series: sd 0 -> 0 required; zero mean -> NULL (delta 0)
    val const = (1 to 10).map(_ => ("g", 5.0))
    val rc = Stats.powerAnalysis(const.toDF("g", "v"), Seq("g"), "v").collect().head
    assert(rc.getAs[Long]("n_required") == 0L)
    val zero = (1 to 10).map(i => ("g", if (i % 2 == 0) 1.0 else -1.0))
    val rz = Stats.powerAnalysis(zero.toDF("g", "v"), Seq("g"), "v").collect().head
    assert(rz.isNullAt(rz.fieldIndex("n_required")), "zero mean cannot define a relative effect")
  }

  // ----------------------------------------------------- withDedupedLines

  test("withDedupedLines: first occurrence wins, order preserved, counts emitted") {
    val df = Seq(
      (1L, "nav bar\ncontent one\nnav bar\ncontent two\n\nnav bar"),
      (2L, "all\nunique\nlines"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = graft.text.TextFunctions.withDedupedLines(df, col("text"), "clean")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean") == "nav bar\ncontent one\ncontent two")
    assert(out(1L).getAs[Long]("clean_n_before") == 5L)
    assert(out(1L).getAs[Long]("clean_n_after") == 3L)
    assert(out(2L).getAs[String]("clean") == "all\nunique\nlines")
    assert(out(3L).isNullAt(out(3L).fieldIndex("clean")))
    assert(out(3L).isNullAt(out(3L).fieldIndex("clean_n_before")))
  }

  // --------------------------------------------- quantileShift / stratAte

  test("quantileShift: uniform +10 shift appears at every probe") {
    // ids (2k, 2k+1) share base k%50 so the arms are the SAME distribution
    val rows = (0 until 100).map(i =>
      ("g", i.toLong, (i / 2 % 50).toDouble + (if (i % 2 == 0) 10.0 else 0.0), i % 2 == 0))
    val out = Stats.quantileShift(rows.toDF("g", "id", "v", "b"), Seq("g"), "v",
        col("b"), Seq(0.25, 0.5, 0.75)).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("shift") - 10.0) < 1e-9,
        s"location shift is uniform across quantiles: $r")
    }
    // empty arm: NULL q_b and shift
    val oneArm = (0 until 10).map(i => ("g", i.toLong, i.toDouble, false))
    val ro = Stats.quantileShift(oneArm.toDF("g", "id", "v", "b"), Seq("g"), "v",
        col("b"), Seq(0.5)).collect().head
    assert(ro.isNullAt(ro.fieldIndex("q_b")) && ro.isNullAt(ro.fieldIndex("shift")))
  }

  test("stratifiedAte: recovers the true effect under imbalanced assignment") {
    // stratum s1: baseline 0, s2: baseline 100; true effect +5 in both.
    // B gets 80% of s2 but 20% of s1 -> pooled diff is badly confounded.
    val rows =
      (1 to 50).map(i => ("s1", i.toLong, 0.0 + (if (i <= 10) 5.0 else 0.0), i <= 10)) ++
      (1 to 50).map(i => ("s2", i.toLong, 100.0 + (if (i <= 40) 5.0 else 0.0), i <= 40))
    val df = rows.toDF("s", "id", "v", "b")
    val r = Stats.stratifiedAte(df, Seq("s"), "v", col("b")).collect().head
    assert(r.getAs[Long]("n") == 100L && r.getAs[Long]("n_strata") == 2L)
    assert(math.abs(r.getAs[Double]("ate") - 5.0) < 1e-6, s"adjusted effect: $r")
    // pooled naive diff for contrast: far from 5
    val naive = df.filter(col("b")).agg(avg("v")).head.getDouble(0) -
      df.filter(!col("b")).agg(avg("v")).head.getDouble(0)
    assert(math.abs(naive - 5.0) > 20.0, s"confounded pooled diff $naive")
    // a stratum missing an arm is reported, not silently averaged
    val missing = rows ++ (1 to 5).map(i => ("s3", i.toLong, 7.0, false))
    val rm = Stats.stratifiedAte(missing.toDF("s", "id", "v", "b"), Seq("s"), "v", col("b"))
      .collect().head
    assert(rm.getAs[Long]("n_strata_incomplete") == 1L)
    assert(math.abs(rm.getAs[Double]("ate") - 5.0) < 1e-6, "weights renormalize over complete strata")
  }

  // --------------------------------------------------- srm / manyVsControl

  test("sampleRatioMismatch: clean 50/50 passes, a broken split screams") {
    val even = (1 to 1000).map(i => ("g", i % 2 == 0))
    val r = Stats.sampleRatioMismatch(even.toDF("g", "b"), Seq("g"), col("b")).collect().head
    assert(r.getAs[Long]("n_a") == 500L && r.getAs[Double]("chi2") == 0.0)
    // 60/40 on n=1000: chi2 = 2*(100^2/500) = 40 >> 3.84
    val broken = (1 to 1000).map(i => ("g", i <= 600))
    val rb = Stats.sampleRatioMismatch(broken.toDF("g", "b"), Seq("g"), col("b")).collect().head
    assert(math.abs(rb.getAs[Double]("chi2") - 40.0) < 1e-9)
    assert(math.abs(rb.getAs[Double]("frac_b") - 0.6) < 1e-9)
    // non-even design ratio: 90/10 expected, observed exactly that -> 0
    val design = (1 to 1000).map(i => ("g", i <= 900))
    val rd = Stats.sampleRatioMismatch(design.toDF("g", "b"), Seq("g"), col("b"),
      expectedB = 0.9).collect().head
    assert(rd.getAs[Double]("chi2") < 1e-9)
  }

  test("manyVsControl: arms test against the control, control is absent") {
    val rows =
      (1 to 100).map(i => ("ctl", 10.0 + (i % 5))) ++
      (1 to 100).map(i => ("up", 13.0 + (i % 5))) ++   // +3 vs control
      (1 to 100).map(i => ("flat", 10.0 + (i % 5)))
    val out = Stats.manyVsControl(rows.toDF("arm", "v"), "arm", "v", "ctl")
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    assert(out.keySet == Set("up", "flat"), "control not emitted")
    assert(math.abs(out("up").getAs[Double]("diff") - 3.0) < 1e-6)
    assert(out("up").getAs[Double]("z") > 5.0, "clear effect")
    assert(out("up").getAs[Double]("p") < 1e-6)
    assert(math.abs(out("flat").getAs[Double]("diff")) < 1e-6)
    assert(out("flat").getAs[Double]("p") > 0.9, "no effect, p near 1")
    assert(out("up").getAs[Long]("n_control") == 100L)
  }

  // ------------------------------------------------ effectSize / oddsRatio

  test("effectSize: textbook d and the Hedges small-sample shrink") {
    // A ~ {0,2} (mean 1), B ~ {2,4} (mean 3): s_pooled = sqrt(2), d = sqrt(2)
    val rows = (1 to 20).map(i => ("g", if (i % 2 == 0) (i % 4).toDouble else (i % 4) + 2.0, i % 2 == 0))
    // simpler explicit frame:
    val df = (Seq.fill(10)(0.0) ++ Seq.fill(10)(2.0)).map(v => ("g", v, false)) ++
      (Seq.fill(10)(2.0) ++ Seq.fill(10)(4.0)).map(v => ("g", v, true))
    val r = Stats.effectSize(df.toDF("g", "v", "b"), Seq("g"), "v", col("b")).collect().head
    assert(r.getAs[Long]("n_a") == 20L && r.getAs[Long]("n_b") == 20L)
    assert(math.abs(r.getAs[Double]("diff") - 2.0) < 1e-9)
    val sp = math.sqrt(20.0 / 19.0) // var of {0,2}x10 = 20/19 (sample)
    assert(math.abs(r.getAs[Double]("s_pooled") - sp) < 1e-9)
    assert(math.abs(r.getAs[Double]("d") - 2.0 / sp) < 1e-9)
    val shrink = 1.0 - 3.0 / (4.0 * 40 - 9.0)
    assert(math.abs(r.getAs[Double]("g") - 2.0 / sp * shrink) < 1e-9)
    // constant arms: pooled 0 -> NULL d
    val const = Seq(("g", 1.0, false), ("g", 1.0, false), ("g", 1.0, true), ("g", 1.0, true))
    val rc = Stats.effectSize(const.toDF("g", "v", "b"), Seq("g"), "v", col("b")).collect().head
    assert(rc.isNullAt(rc.fieldIndex("d")))
  }

  test("oddsRatio: Haldane correction keeps zero cells finite") {
    // A: 10 rows 2 hits; B: 10 rows 8 hits -> OR ~ (8.5*8.5)/(2.5*2.5)
    val rows = (1 to 10).map(i => ("g", i <= 2, false)) ++
      (1 to 10).map(i => ("g", i <= 8, true))
    val r = Stats.oddsRatio(rows.toDF("g", "h", "b"), Seq("g"), col("h"), col("b"))
      .collect().head
    assert(math.abs(r.getAs[Double]("odds_ratio") - (8.5 * 8.5) / (2.5 * 2.5)) < 1e-9)
    // zero cell: no hits in A -> still finite
    val zero = (1 to 10).map(i => ("g", false, false)) ++
      (1 to 10).map(i => ("g", i <= 5, true))
    val rz = Stats.oddsRatio(zero.toDF("g", "h", "b"), Seq("g"), col("h"), col("b"))
      .collect().head
    assert(!rz.isNullAt(rz.fieldIndex("odds_ratio")) &&
      rz.getAs[Double]("odds_ratio") > 1.0)
    assert(rz.getAs[Long]("k_a") == 0L)
  }

  // ------------------------------------------------------ msprt / rateRatio

  test("msprt: no effect keeps p near 1, a real effect drives it down") {
    val noEff = (1 to 200).map(i => ("g", 10.0 + (i % 7), i % 2 == 0))
    val r0 = Stats.msprt(noEff.toDF("g", "v", "b"), Seq("g"), "v", col("b")).collect().head
    assert(r0.getAs[Double]("p_always") > 0.5, s"null effect: $r0")
    val eff = (1 to 200).map(i => ("g", (if (i % 2 == 0) 15.0 else 10.0) + (i % 7), i % 2 == 0))
    val r1 = Stats.msprt(eff.toDF("g", "v", "b"), Seq("g"), "v", col("b")).collect().head
    assert(r1.getAs[Double]("p_always") < 0.01, s"clear effect: $r1")
    // evidence accumulates: doubling the data shrinks p further
    val eff2 = (1 to 400).map(i => ("g", (if (i % 2 == 0) 15.0 else 10.0) + (i % 7), i % 2 == 0))
    val r2 = Stats.msprt(eff2.toDF("g", "v", "b"), Seq("g"), "v", col("b")).collect().head
    assert(r2.getAs[Double]("p_always") <= r1.getAs[Double]("p_always"))
    // p is a probability: capped at 1 even when lambda < 1
    assert(r0.getAs[Double]("p_always") <= 1.0)
  }

  test("rateRatio: hand-computed ratio and zero-cell guard") {
    // A: 2 events over exposure 100; B: 8 events over exposure 100
    val rows = (1 to 10).map(i => ("g", if (i <= 2) 60.0 else 10.0, 10.0, false)) ++
      (1 to 10).map(i => ("g", if (i <= 8) 60.0 else 10.0, 10.0, true))
    val df = rows.toDF("g", "v", "w", "b")
    val r = Stats.rateRatio(df, Seq("g"), col("v") > 50.0, "w", col("b")).collect().head
    assert(r.getAs[Long]("k_a") == 2L && r.getAs[Long]("k_b") == 8L)
    assert(math.abs(r.getAs[Double]("t_a") - 100.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("rate_ratio") - 4.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("se_log_rr") - math.sqrt(0.5 + 0.125)) < 1e-9)
    // zero events in one arm: NULL ratio, not infinity
    val zero = (1 to 10).map(i => ("g", 10.0, 10.0, false)) ++
      (1 to 10).map(i => ("g", 60.0, 10.0, true))
    val rz = Stats.rateRatio(zero.toDF("g", "v", "w", "b"), Seq("g"),
      col("v") > 50.0, "w", col("b")).collect().head
    assert(rz.isNullAt(rz.fieldIndex("rate_ratio")))
  }

  // ---------------------------------------------------------- ratioMetricCi

  test("ratioMetricCi: ratio of sums, clustering widens the naive CI") {
    // 50 units: x_i/y_i with y varying; ratio = sum(x)/sum(y)
    val units = (1 to 50).map(i => ("g", i.toLong, (i % 3).toDouble, 10.0 + (i % 5)))
    val df = units.toDF("g", "u", "x", "y")
    val r = Stats.ratioMetricCi(df, Seq("g"), "x", "y").collect().head
    val sx = units.map(_._3).sum
    val sy = units.map(_._4).sum
    assert(math.abs(r.getAs[Double]("ratio") - sx / sy) < 1e-9)
    assert(r.getAs[Double]("se") > 0.0)
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("ratio"))
    assert(r.getAs[Double]("ci_hi") > r.getAs[Double]("ratio"))
    // perfectly proportional units (x = 0.2*y): zero variance ratio -> se 0
    val prop = (1 to 50).map(i => ("g", i.toLong, 2.0 * (1 + i % 5), 10.0 * (1 + i % 5)))
    val rp = Stats.ratioMetricCi(prop.toDF("g", "u", "x", "y"), Seq("g"), "x", "y")
      .collect().head
    assert(math.abs(rp.getAs[Double]("ratio") - 0.2) < 1e-9)
    assert(rp.getAs[Double]("se") < 1e-9, "proportional clusters carry no ratio variance")
    // single unit: NULL se/ci
    val one = Seq(("g", 1L, 1.0, 2.0)).toDF("g", "u", "x", "y")
    val ro = Stats.ratioMetricCi(one, Seq("g"), "x", "y").collect().head
    assert(ro.isNullAt(ro.fieldIndex("se")))
  }
}
