package graft

import graft.operators.{Graph, Hits, QuantileNormalize, Skew}
import org.apache.spark.sql.functions._

/** Round-6 second batch: Adamic-Adar link prediction, HITS, join-key
  * skew audit, cross-source quantile normalization.
  */
class Round6bOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ adamicAdar

  test("adamicAdar: textbook scores, existing edges excluded") {
    // square 1-3, 3-2, 2-4, 4-1: (1,2) share {3,4}, (3,4) share {1,2},
    // all four centers have degree 2 -> score 2/ln 2 each
    val sq = Seq((1, 3), (3, 2), (2, 4), (4, 1)).toDF("src", "dst")
    val out = Graph.adamicAdar(sq, maxDegree = 64, minCommon = 2L)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    assert(out.keySet == Set((1, 2), (3, 4)))
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_common") == 2L)
      assert(math.abs(r.getAs[Double]("score") - 2.0 / math.log(2.0)) < 1e-9)
    }
    // close the (1,2) edge: the pair is adjacent now and must vanish
    val closed = sq.unionAll(Seq((1, 2)).toDF("src", "dst"))
    val out2 = Graph.adamicAdar(closed, maxDegree = 64, minCommon = 1L)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(!out2.contains((1, 2)), "adjacent pairs are not predictions")
    assert(out2.contains((3, 4)))
  }

  test("adamicAdar: hub centers above maxDegree contribute nothing") {
    // star: hub 0 connected to 1..5 (deg 5); spokes pair only through it
    val star = (1 to 5).map(i => (0, i)).toDF("src", "dst")
    assert(Graph.adamicAdar(star, maxDegree = 4, minCommon = 1L).count() == 0L,
      "the only common neighbor is the truncated hub")
    val kept = Graph.adamicAdar(star, maxDegree = 5, minCommon = 1L).collect()
    assert(kept.length == 10, "all C(5,2) spoke pairs through the kept hub")
    kept.foreach(r => assert(math.abs(r.getAs[Double]("score") - 1.0 / math.log(5.0)) < 1e-9))
  }

  // ------------------------------------------------------------------ hits

  test("hits: two-round hand computation with L1 normalization") {
    // a->b, a->c, d->b: a and d are hubs, b and c authorities
    val e = Seq(("a", "b"), ("a", "c"), ("d", "b")).toDF("src", "dst")
    val out = Hits.hits(e, iters = 2).collect()
      .map(r => r.getString(0) -> r).toMap
    // round 1: auth b=2/3 c=1/3; hub a=(2/3+1/3)/tot=3/5, d=(2/3)/tot=2/5
    // round 2: auth b=(3/5+2/5)/1.6=0.625, c=(3/5)/1.6=0.375
    //          hub a=(0.625+0.375)/1.625, d=0.625/1.625
    assert(math.abs(out("b").getAs[Double]("auth") - 0.625) < 1e-9)
    assert(math.abs(out("c").getAs[Double]("auth") - 0.375) < 1e-9)
    assert(out("a").getAs[Double]("auth") == 0.0, "no in-edges -> auth 0")
    assert(math.abs(out("a").getAs[Double]("hub") - 1.0 / 1.625) < 1e-9)
    assert(math.abs(out("d").getAs[Double]("hub") - 0.625 / 1.625) < 1e-9)
    assert(out("b").getAs[Double]("hub") == 0.0, "no out-edges -> hub 0")
    // each L1-normalized family sums to 1
    assert(math.abs(out.values.map(_.getAs[Double]("auth")).sum - 1.0) < 1e-9)
    assert(math.abs(out.values.map(_.getAs[Double]("hub")).sum - 1.0) < 1e-9)
  }

  test("hits: parallel edges weigh like repeated edges") {
    val parallel = Seq(("a", "b"), ("a", "b"), ("c", "d")).toDF("src", "dst")
    val expanded = Seq(("a", "b"), ("c", "d")).toDF("src", "dst")
    val p = Hits.hits(parallel, iters = 1).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("auth")).toMap
    // auth mass b = 2, d = 1 -> 2/3 vs 1/3; the unweighted graph gives 1/2 each
    assert(math.abs(p("b") - 2.0 / 3.0) < 1e-9)
    val u = Hits.hits(expanded, iters = 1).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("auth")).toMap
    assert(u("b") == 0.5)
  }

  // ---------------------------------------------------------- keySkewAudit

  test("keySkewAudit: counts, shares, skew ratio and salt recommendation") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c")).toDF("k")
    val rows = Skew.keySkewAudit(df, "k", topK = 2).collect()
    assert(rows.length == 2)
    val top = rows.find(_.getAs[Int]("rank") == 1).get
    assert(top.getAs[String]("key") == "a" && top.getAs[Long]("n") == 6L)
    assert(math.abs(top.getAs[Double]("share") - 0.6) < 1e-12)
    assert(top.getAs[Long]("n_rows") == 10L && top.getAs[Long]("n_keys") == 3L)
    // avg 10/3, max 6 -> skew 1.8, recommended salts = ceil(1.8) = 2
    assert(math.abs(top.getAs[Double]("skew") - 1.8) < 1e-12)
    assert(top.getAs[Long]("salts") == 2L)
    // rank 2 tie-breaks on key name: b before c
    assert(rows.find(_.getAs[Int]("rank") == 2).get.getAs[String]("key") == "b")
  }

  // ----------------------------------------------------- quantileNormalize

  test("quantileNormalize: equal within-group ranks map to equal corpus values") {
    // group A is 100x group B in scale; same shape
    val df = (Seq(100.0, 200.0, 300.0, 400.0).zipWithIndex.map { case (v, i) => (i.toLong, "A", v) } ++
      Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) => (i + 10L, "B", v) })
      .toDF("id", "grp", "v")
    val out = QuantileNormalize.quantileNormalize(df, "grp", "id", "v", nBins = 4)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // rank k within A and within B land in the same bin -> same norm
    for (k <- 0 until 4) {
      val a = out(k.toLong); val b = out(k + 10L)
      assert(a.getAs[Long]("bin") == b.getAs[Long]("bin"))
      assert(a.getAs[Double]("norm") == b.getAs[Double]("norm"),
        "same within-group rank -> same corpus reference value")
      assert(a.getAs[Double]("pr") == b.getAs[Double]("pr"))
    }
    // the top rank maps to the corpus maximum
    assert(out(3L).getAs[Double]("norm") == 400.0)
    // pr=0 clamps into bin 1, not bin 0
    assert(out(0L).getAs[Long]("bin") == 1L)
  }

  // -------------------------------------------------------- fertilityStats

  test("fertilityStats: corpus-level ratios of exact sums") {
    import graft.text.TextFunctions
    // "ab cd" -> 2 words, 2 bpeish tokens, 5 bytes; "a-b" -> 2 words, 3 tokens
    val df = Seq(("g", "ab cd"), ("g", "a-b"), ("h", "???")).toDF("grp", "text")
    val out = TextFunctions.fertilityStats(df, "grp").collect()
      .map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getAs[Long]("n_docs") == 2L && g.getAs[Long]("n_words") == 4L)
    assert(g.getAs[Long]("n_tokens") == 5L && g.getAs[Long]("n_bytes") == 8L)
    assert(math.abs(g.getAs[Double]("fertility") - 1.25) < 1e-12)
    assert(math.abs(g.getAs[Double]("bytes_per_token") - 1.6) < 1e-12)
    // no [a-z] words at all: fertility NULL, not a crash or a dropped group
    val h = out("h")
    assert(h.getAs[Long]("n_words") == 0L && h.isNullAt(h.fieldIndex("fertility")))
    assert(h.getAs[Long]("n_tokens") == 3L)
  }

  // ------------------------------------------------------ hourOfDayProfile

  test("hourOfDayProfile: peak hour with tie-break, entropy extremes") {
    import graft.operators.Seasonal
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // k1: all in hour 3 -> entropy 0, peak (3, 1.0)
    // k2: 2 at hour 1, 2 at hour 5, 1 at hour 9 -> peak ties broken by hour
    val rows = Seq.tabulate(4)(i => ("k1", ts(3, i))) ++
      Seq(("k2", ts(1, 0)), ("k2", ts(1, 1)), ("k2", ts(5, 0)), ("k2", ts(5, 1)),
        ("k2", ts(9, 0)))
    val out = Seasonal.hourOfDayProfile(rows.toDF("k", "t"), "k", "t")
      .collect().map(r => r.getString(0) -> r).toMap
    val k1 = out("k1")
    assert(k1.getAs[Long]("n") == 4L && k1.getAs[Long]("peak_hour") == 3L)
    assert(k1.getAs[Double]("peak_share") == 1.0)
    assert(k1.getAs[Double]("entropy_norm") == 0.0)
    val k2 = out("k2")
    assert(k2.getAs[Long]("peak_hour") == 1L, "count tie 2=2 resolves to the earlier hour")
    assert(math.abs(k2.getAs[Double]("peak_share") - 0.4) < 1e-9)
    val h = -(0.4 * math.log(0.4) * 2 + 0.2 * math.log(0.2)) / math.log(24.0)
    assert(math.abs(k2.getAs[Double]("entropy_norm") - h) < 1e-5)
  }

  // ------------------------------------------------ pFromZ / benjaminiHochberg

  test("pFromZ: textbook tail values within the A&S 1e-5 bound; NULL propagates") {
    import graft.operators.Hypothesis
    val df = Seq(Some(0.0), Some(1.959964), Some(2.575829), None).toDF("z")
    val out = df.select(col("z"), Hypothesis.pFromZ(col("z")).as("p")).collect()
    val p = out.map(r => Option(r.get(0)).map(_.toString) -> r).toMap
    assert(math.abs(p(Some("0.0")).getAs[Double]("p") - 1.0) < 2e-5)
    assert(math.abs(p(Some("1.959964")).getAs[Double]("p") - 0.05) < 2e-5)
    assert(math.abs(p(Some("2.575829")).getAs[Double]("p") - 0.01) < 2e-5)
    assert(p(None).isNullAt(1), "NULL z -> NULL p (least() must not swallow it)")
  }

  test("benjaminiHochberg: textbook step-up, monotone q, NULLs pass through") {
    import graft.operators.Hypothesis
    val tests = Seq(("a", Some(0.01)), ("b", Some(0.02)), ("c", Some(0.03)),
      ("d", Some(0.04)), ("e", Some(0.9)), ("f", None)).toDF("t", "p")
    val out = Hypothesis.benjaminiHochberg(tests, "p", Seq("t"), alpha = 0.05)
      .collect().map(r => r.getString(0) -> r).toMap
    // adj = p*m/rank = [.05, .05, .05, .05, .9]; suffix-min leaves them as-is
    Seq("a", "b", "c", "d").foreach { t =>
      assert(math.abs(out(t).getAs[Double]("q") - 0.05) < 1e-12)
      assert(out(t).getAs[Boolean]("reject"), s"$t must be rejected at alpha=0.05")
    }
    assert(math.abs(out("e").getAs[Double]("q") - 0.9) < 1e-12)
    assert(!out("e").getAs[Boolean]("reject"))
    assert(out("a").getAs[Long]("m") == 5L, "m counts only testable rows")
    assert(out("f").isNullAt(out("f").fieldIndex("q")), "NULL p passes through, not dropped")
    // q is monotone non-decreasing in rank
    val byRank = out.values.filter(!_.isNullAt(out("a").fieldIndex("rank")))
      .toSeq.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("q"))
    assert(byRank == byRank.sorted)
  }

  test("benjaminiHochberg: suffix minimum caps early high p") {
    import graft.operators.Hypothesis
    // p = [0.04, 0.05]: adj = [0.08, 0.05] -> q(rank1) = min(0.08, 0.05) = 0.05
    val tests = Seq(("a", 0.04), ("b", 0.05)).toDF("t", "p")
    val out = Hypothesis.benjaminiHochberg(tests, "p", Seq("t"), alpha = 0.05)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(out("a").getAs[Double]("q") - 0.05) < 1e-12)
    assert(out("a").getAs[Boolean]("reject") && out("b").getAs[Boolean]("reject"))
  }

  // ------------------------------------------------------ averagePrecision

  test("averagePrecision: textbook curve; all-positive gives 1; none gives NULL") {
    import graft.operators.Evaluation
    // ranked by score desc: pos, neg, pos, neg -> AP = (1/2)(1/1 + 2/3)
    val df = Seq(("g", 4.0, 1L, true), ("g", 3.0, 2L, false), ("g", 2.0, 3L, true),
      ("g", 1.0, 4L, false), ("h", 9.0, 5L, true), ("z", 9.0, 6L, false))
      .toDF("k", "s", "id", "y")
    val out = Evaluation.averagePrecision(df, Seq("k"), "s", "id", col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(out("g").getAs[Double]("ap") - (1.0 + 2.0 / 3.0) / 2.0) < 1e-6)
    assert(out("g").getAs[Long]("n_pos") == 2L)
    assert(out("h").getAs[Double]("ap") == 1.0)
    assert(out("z").isNullAt(out("z").fieldIndex("ap")), "no positives -> NULL, not 0")
  }

  test("averagePrecision: ranking ties break by id deterministically") {
    import graft.operators.Evaluation
    // equal scores: id order decides; pos at id 1 -> P@1 = 1
    val df = Seq(("g", 5.0, 1L, true), ("g", 5.0, 2L, false)).toDF("k", "s", "id", "y")
    assert(Evaluation.averagePrecision(df, Seq("k"), "s", "id", col("y"))
      .collect()(0).getAs[Double]("ap") == 1.0)
  }

  // --------------------------------------------------------- markupSignals

  test("markupSignals: tag/link counts, strip length, text ratio") {
    import graft.text.TextFunctions
    val df = Seq(
      (1L, """<p class="c">hello</p> <a href="x">link</a>"""),
      (2L, "plain text"),
      (3L, "")).toDF("id", "text")
    val out = df.select(col("id"), TextFunctions.markupSignals(col("text")).as("m"))
      .select(col("id"), col("m.*")).collect().map(r => r.getAs[Long]("id") -> r).toMap
    val h = out(1L)
    assert(h.getAs[Long]("n_tags") == 4L)
    assert(h.getAs[Long]("n_links") == 1L)
    // stripped: "hello" + " " + "link" = 10 chars
    assert(h.getAs[Long]("stripped_len") == 10L)
    assert(h.getAs[Long]("markup_chars") + 10L == 43L)
    assert(math.abs(h.getAs[Double]("text_ratio") - 10.0 / 43.0) < 1e-9)
    val p = out(2L)
    assert(p.getAs[Long]("n_tags") == 0L && p.getAs[Double]("text_ratio") == 1.0)
    assert(out(3L).isNullAt(out(3L).fieldIndex("text_ratio")), "empty text -> NULL ratio")
  }

  // ---------------------------------------------------------- healthReport

  test("healthReport: norms, centroid cosine, and collapse detection") {
    import graft.ann.Embeddings
    // group "same": two identical unit vectors -> mean_cos 1 (collapsed);
    // group "anti": opposite vectors -> centroid pulls toward `same`
    val e1 = Array(1.0f, 0.0f)
    val df = Seq(("same", e1), ("same", e1), ("anti", Array(-1.0f, 0.0f)),
      ("orth", Array(0.0f, 2.0f))).toDF("grp", "embedding")
    val out = Embeddings.healthReport(df, "grp", "embedding")
      .collect().map(r => r.getString(0) -> r).toMap
    // centroid = mean of (1,0),(1,0),(-1,0),(0,2) = (0.25, 0.5)
    val c = (0.25, 0.5)
    val cn = math.sqrt(c._1 * c._1 + c._2 * c._2)
    assert(out("same").getAs[Long]("n") == 2L)
    assert(math.abs(out("same").getAs[Double]("mean_norm") - 1.0) < 1e-6)
    assert(out("same").getAs[Double]("std_norm") < 1e-6)
    assert(math.abs(out("same").getAs[Double]("mean_cos") - c._1 / cn) < 1e-6)
    assert(math.abs(out("anti").getAs[Double]("mean_cos") + c._1 / cn) < 1e-6)
    assert(math.abs(out("orth").getAs[Double]("mean_norm") - 2.0) < 1e-6)
    assert(math.abs(out("orth").getAs[Double]("mean_cos") - c._2 / cn) < 1e-6)
  }

  // ------------------------------------------------- personalizedPageRank

  test("personalizedPageRank: teleport mass stays on the seed side") {
    import graft.operators.PageRank
    // a -> b -> c, seed {a}: after 1 round b holds a's full initial mass
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val r1 = PageRank.personalizedPageRank(e, seeds, iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(r1("a") - 0.15) < 1e-12, "seed keeps only teleport mass")
    assert(math.abs(r1("b") - 0.85) < 1e-12, "full damped mass from the seed")
    assert(r1("c") == 0.0, "two hops away after one round: still 0")
    val r2 = PageRank.personalizedPageRank(e, seeds, iters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r2("c") > 0.0, "mass propagates one hop per round")
    // a node disconnected from the seeds stays at exactly 0 forever
    val e2 = e.unionAll(Seq(("x", "y")).toDF("src", "dst"))
    val r3 = PageRank.personalizedPageRank(e2, seeds, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r3("x") == 0.0 && r3("y") == 0.0, "unreachable from seeds -> 0, the 'unrelated' class")
  }

  // --------------------------------------------------------------- zipfFit

  test("zipfFit: exact power law recovers slope -1; tiny vocab is NULL") {
    import graft.text.Keywords
    // counts 12, 6, 4 = 12/rank -> ln f = ln 12 - ln rank exactly
    val text = (Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++ Seq.fill(4)("cc")).mkString(" ")
    val df = Seq(("g", text), ("h", "one two")).toDF("source", "text")
    val out = Keywords.zipfFit(df, "source", topN = 10).collect()
      .map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getAs[Long]("n_terms") == 3L)
    assert(math.abs(g.getAs[Double]("slope") + 1.0) < 1e-4)
    assert(math.abs(g.getAs[Double]("intercept") - math.log(12.0)) < 1e-4)
    assert(out("h").isNullAt(out("h").fieldIndex("slope")), "2 points always fit — NULL")
  }

  // ------------------------------------------------------------ kAnonymity

  test("kAnonymity: class sizes, singletons, rows at risk") {
    import graft.operators.Integrity
    val df = (Seq(("a", 1)) ++ Seq.fill(2)(("b", 1)) ++ Seq.fill(5)(("c", 2)))
      .toDF("q1", "q2")
    val r = Integrity.kAnonymity(df, Seq("q1", "q2"), k = 5L).collect()(0)
    assert(r.getAs[Long]("n_rows") == 8L && r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("n_singletons") == 1L)
    assert(r.getAs[Long]("n_rows_at_risk") == 3L, "classes of size 1 and 2 are below k=5")
    assert(r.getAs[Long]("min_class_size") == 1L)
    assert(math.abs(r.getAs[Double]("frac_at_risk") - 3.0 / 8.0) < 1e-12)
  }

  // ------------------------------------------------------------ LshTuning

  test("lsh calibration: identical pairs caught, disjoint near-misses are not") {
    import graft.dedup.LshTuning
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten"
    // 1,2 identical (jaccard 1 -> bin 9); 3 shares nothing with them but
    // pairs (1,3)/(2,3) share zero shingles -> absent from the report
    val df = Seq((1L, base), (2L, base), (3L, other), (4L, other)).toDF("doc_id", "text")
    val out = LshTuning.calibrationReport(df, sampleN = 10, nBins = 10)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(out.keySet == Set(9L), "only shingle-sharing pairs appear; both are identical pairs")
    val b9 = out(9L)
    assert(b9.getAs[Long]("n_pairs") == 2L)
    assert(b9.getAs[Double]("mean_est") == 1.0, "identical docs agree on every hash")
    assert(b9.getAs[Double]("catch_rate") == 1.0, "every band collides")
    // theory at s = 0.95 with r=2, b=4: 1 - (1 - s^2)^4
    val s = 0.95; val th = 1.0 - math.pow(1.0 - s * s, 4)
    assert(math.abs(b9.getAs[Double]("theory") - th) < 1e-9)
  }

  test("lsh calibration: partial overlap lands in its exact-jaccard bin") {
    import graft.dedup.LshTuning
    // doc1 tokens a..l, doc2 tokens e..p (letter words — the tokenizer
    // strips digits): 5-gram shingle sets overlap in a computable band
    def words(a: Char, b: Char) = (a to b).map(c => s"w$c$c").mkString(" ")
    val df = Seq((1L, words('a', 'l')), (2L, words('e', 'p'))).toDF("doc_id", "text")
    val out = LshTuning.calibrationReport(df, sampleN = 10, nBins = 10).collect()
    assert(out.length == 1)
    // doc1 shingles: w1..w8 starts (8), doc2: w5..w12 starts (8); common
    // starts w5..w8 = 4 -> jaccard 4/12 = 1/3 -> bin 3
    assert(out(0).getAs[Long]("bin") == 3L)
    assert(out(0).getAs[Long]("n_pairs") == 1L)
  }

  // ------------------------------------------------------- holtWintersLast

  test("holtWintersLast: hand-computed period-2 alternating series") {
    import graft.operators.Ewma
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$i%02d:00")
    // series 10,20,10,20 with alpha=.5, beta=0, gamma=.5, m=2
    val df = Seq(10.0, 20.0, 10.0, 20.0).zipWithIndex
      .map { case (v, i) => ("u", ts(i), v, i.toLong) }.toDF("k", "t", "v", "tie")
    val r = Ewma.holtWintersLast(df, "k", "t", "v", "tie", 0.5, 0.0, 0.5, period = 2)
      .collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("level") == 15.0)
    assert(r.getAs[Double]("trend") == 0.0)
    // next slot is s_0 = -1.25 -> forecast 15 + 0 - 1.25
    assert(r.getAs[Double]("forecast") == 13.75)
  }

  test("holtWintersLast: gamma = 0 reduces exactly to holtLast") {
    import graft.operators.Ewma
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$i%02d:00")
    val df = Seq(3.0, 7.0, 4.0, 9.0, 6.0).zipWithIndex
      .map { case (v, i) => ("u", ts(i), v, i.toLong) }.toDF("k", "t", "v", "tie")
    val hw = Ewma.holtWintersLast(df, "k", "t", "v", "tie", 0.5, 0.3, 0.0, period = 3)
      .collect()(0)
    val h = Ewma.holtLast(df, "k", "t", "v", "tie", 0.5, 0.3).collect()(0)
    assert(hw.getAs[Double]("level") == h.getAs[Double]("level"))
    assert(hw.getAs[Double]("trend") == h.getAs[Double]("trend"))
    assert(hw.getAs[Double]("forecast") == h.getAs[Double]("forecast"),
      "zero seasonal learning keeps every slot at 0 — identical to Holt")
  }

  // ------------------------------------------------------------ burstiness

  test("burstiness: Fano factor of hourly counts; single bucket is 0") {
    import graft.operators.Seasonal
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // k1: 1 event in hour 0, 3 in hour 1 -> mean 2, var 1, fano 0.5
    // k2: 4 events all in one hour -> var 0 -> fano 0
    val rows = Seq(("k1", ts(0, 0)), ("k1", ts(1, 0)), ("k1", ts(1, 1)), ("k1", ts(1, 2))) ++
      Seq.tabulate(4)(i => ("k2", ts(5, i)))
    val out = Seasonal.burstiness(rows.toDF("k", "t"), "k", "t")
      .collect().map(r => r.getString(0) -> r).toMap
    val k1 = out("k1")
    assert(k1.getAs[Long]("n_events") == 4L && k1.getAs[Long]("n_buckets") == 2L)
    assert(k1.getAs[Double]("mean_per_bucket") == 2.0)
    assert(k1.getAs[Double]("fano") == 0.5)
    assert(out("k2").getAs[Double]("fano") == 0.0)
  }

  // -------------------------------------------------------- winsorizedMean

  test("winsorizedMean: tail clamped into the quantile band, all rows kept") {
    import graft.operators.Outliers
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("g", _)).toDF("k", "v")
    val r = Outliers.winsorizedMean(df, Seq("k"), "v", pLo = 0.25, pHi = 0.75)
      .collect()(0)
    assert(r.getAs[Long]("n") == 5L)
    assert(math.abs(r.getAs[Double]("mean") - 22.0) < 1e-6)
    // R-7 p25 = 2, p75 = 4 -> clamped [2,2,3,4,4] -> mean 3
    assert(r.getAs[Double]("lo") == 2.0 && r.getAs[Double]("hi") == 4.0)
    assert(math.abs(r.getAs[Double]("wins_mean") - 3.0) < 1e-6,
      "outlier capped to the band edge, not dropped")
  }

  // ----------------------------------------------------------------- cuped

  test("cuped: hand-computed theta, adjusted lift, variance reduction") {
    import graft.operators.Stats
    // units 1..4: pre covariate x = 1,2,3,4; post metric y = 2x + 10*arm
    // with arms [1,1,0,0] -> pooled theta = -2, raw lift 6, adjusted 2
    val rows = Seq(
      (1L, "pre", 1.0, 1), (1L, "post", 12.0, 1),
      (2L, "pre", 2.0, 1), (2L, "post", 14.0, 1),
      (3L, "pre", 3.0, 0), (3L, "post", 6.0, 0),
      (4L, "pre", 4.0, 0), (4L, "post", 8.0, 0),
      (5L, "pre", 9.0, 0)) // unit 5 has no post period -> dropped
      .map { case (u, p, v, a) => ("g", u, p, v, a) }
      .toDF("grp", "u", "period", "v", "arm")
    val r = Stats.cuped(rows, Seq("grp"), "u", "v",
      inPre = col("period") === "pre", inA = col("arm") === 1).collect()(0)
    assert(r.getAs[Long]("n_units") == 4L, "incomplete units dropped, visibly")
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(math.abs(r.getAs[Double]("theta") + 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("diff_raw") - 6.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("diff_adj") - 2.0) < 1e-6)
    // cov^2/(vx*vy) = 1600/(20*160) = 0.5
    assert(math.abs(r.getAs[Double]("var_reduction") - 0.5) < 1e-6)
  }

  test("cuped: constant covariate yields NULL theta, raw lift intact") {
    import graft.operators.Stats
    val rows = Seq(
      (1L, "pre", 5.0, 1), (1L, "post", 10.0, 1),
      (2L, "pre", 5.0, 0), (2L, "post", 4.0, 0))
      .map { case (u, p, v, a) => ("g", u, p, v, a) }
      .toDF("grp", "u", "period", "v", "arm")
    val r = Stats.cuped(rows, Seq("grp"), "u", "v",
      inPre = col("period") === "pre", inA = col("arm") === 1).collect()(0)
    assert(r.isNullAt(r.fieldIndex("theta")), "var(x) = 0 -> nothing to regress out")
    assert(math.abs(r.getAs[Double]("diff_raw") - 6.0) < 1e-6)
  }

  test("quantileNormalize: flips to the approx sketch under the session conf") {
    val df = (1 to 100).map(i => (i.toLong, "g", i.toDouble)).toDF("id", "grp", "v")
    def norms() = QuantileNormalize.quantileNormalize(df, "grp", "id", "v", nBins = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("norm")).toMap
    val exact = norms()
    spark.conf.set(graft.operators.Quantiles.ApproxKey, "true")
    try {
      val approx = norms()
      // accuracy 10000 on 100 rows: the sketch is rank-exact, so the only
      // difference is R-7 interpolation (<= one value spacing)
      exact.foreach { case (id, e) => assert(math.abs(approx(id) - e) <= 1.0 + 1e-9) }
    } finally spark.conf.unset(graft.operators.Quantiles.ApproxKey)
  }
}
