package graft

import graft.ann.Lof
import graft.operators.{Integrity, Recommend, Seasonal, Stats}
import graft.text.{LineDedup, Tfidf}
import org.apache.spark.sql.functions._

/** Round-6 fourth batch: Kendall τ-b, Ljung–Box, seasonal-naive skill,
  * CCNet LM buckets, boilerplate report, l-diversity, item-item CF, LOF.
  */
class Round6dOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ kendallTau

  test("kendallTau: perfect agreement 1, reversal -1, tie handling") {
    val up = (1 to 6).map(i => ("g", i.toLong, i.toDouble, i * 2.0)).toDF("g", "id", "x", "y")
    val r1 = Stats.kendallTau(up, Seq("g"), "id", "x", "y").collect().head
    assert(r1.getAs[Long]("n_pairs") == 15L && r1.getAs[Double]("tau_b") == 1.0)
    val down = (1 to 6).map(i => ("g", i.toLong, i.toDouble, -i.toDouble)).toDF("g", "id", "x", "y")
    assert(Stats.kendallTau(down, Seq("g"), "id", "x", "y")
      .collect().head.getAs[Double]("tau_b") == -1.0)
    // all-tied x: denominator factor 0 -> NULL
    val tied = (1 to 4).map(i => ("g", i.toLong, 7.0, i.toDouble)).toDF("g", "id", "x", "y")
    val rT = Stats.kendallTau(tied, Seq("g"), "id", "x", "y").collect().head
    assert(rT.isNullAt(rT.fieldIndex("tau_b")))
    // textbook tau-b: x=(1,2,3,3), y=(1,2,3,4): C=5, D=0, tx=1, ty=0
    // tau = 5/sqrt(5*6) ~ 0.912871
    val tb = Seq(("g", 1L, 1.0, 1.0), ("g", 2L, 2.0, 2.0), ("g", 3L, 3.0, 3.0),
      ("g", 4L, 3.0, 4.0)).toDF("g", "id", "x", "y")
    val rB = Stats.kendallTau(tb, Seq("g"), "id", "x", "y").collect().head
    assert(rB.getAs[Long]("concordant") == 5L && rB.getAs[Long]("discordant") == 0L)
    assert(math.abs(rB.getAs[Double]("tau_b") - 5.0 / math.sqrt(30.0)) < 1e-9)
  }

  test("kendallTau: the sample cap binds and stays deterministic") {
    val big = (1 to 500).map(i => ("g", i.toLong, i.toDouble, i.toDouble)).toDF("g", "id", "x", "y")
    val r = Stats.kendallTau(big, Seq("g"), "id", "x", "y", sampleN = 50).collect().head
    assert(r.getAs[Long]("n") == 50L && r.getAs[Long]("n_pairs") == 1225L)
    assert(r.getAs[Double]("tau_b") == 1.0, "monotone relation survives any sample")
    val r2 = Stats.kendallTau(big, Seq("g"), "id", "x", "y", sampleN = 50).collect().head
    assert(r.getAs[Long]("concordant") == r2.getAs[Long]("concordant"), "deterministic")
  }

  // -------------------------------------------------------------- ljungBox

  test("ljungBox: alternating series scores far above iid-ish noise") {
    // x = +1,-1,+1,... has rho_1 ~ -1: Q blows up
    val alt = (1 to 40).map(i => (1L, i.toLong, i.toLong, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("k", "t", "tie", "x")
    val q = Stats.ljungBox(alt, Seq("k"), "t", "tie", "x", maxLag = 3).collect().head
    assert(q.getAs[Long]("n_obs") == 40L && q.getAs[Long]("n_lags") == 3L)
    assert(q.getAs[Double]("q") > 30.0, s"strong lag-1 structure: $q")
    // constant series: rho undefined -> NULL q
    val const = (1 to 10).map(i => (1L, i.toLong, i.toLong, 5.0)).toDF("k", "t", "tie", "x")
    val qc = Stats.ljungBox(const, Seq("k"), "t", "tie", "x", maxLag = 2).collect().head
    assert(qc.isNullAt(qc.fieldIndex("q")))
    // too-short series (n <= maxLag): NULL q, not a crash
    val short = (1 to 3).map(i => (1L, i.toLong, i.toLong, i.toDouble)).toDF("k", "t", "tie", "x")
    val qs = Stats.ljungBox(short, Seq("k"), "t", "tie", "x", maxLag = 3).collect()
    assert(qs.forall(r => r.isNullAt(r.fieldIndex("q"))))
  }

  // ---------------------------------------------------- seasonalNaiveSkill

  test("seasonalNaiveSkill: a perfect period-4 cycle has skill 0") {
    // hourly buckets with volumes cycling 1,2,3,4,1,2,3,4,... : the
    // lag-4 predictor is exact (mae_seasonal = 0), lag-1 is not
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 16).flatMap { h =>
      val n = 1 + (h % 4)
      Seq.fill(n)(("k", new java.sql.Timestamp(t0 + h * 3600L * 1000)))
    }
    val df = rows.toDF("key", "ts")
    val r = Seasonal.seasonalNaiveSkill(df, "key", "ts", period = 4).collect().head
    assert(r.getAs[Long]("n_buckets") == 16L)
    assert(r.getAs[Double]("mae_seasonal") == 0.0)
    assert(r.getAs[Double]("mae_naive") > 0.0)
    assert(r.getAs[Double]("skill") == 0.0)
    // constant series: mae_naive = 0 -> NULL skill
    val flat = (0 until 6).map(h => ("k", new java.sql.Timestamp(t0 + h * 3600L * 1000)))
      .toDF("key", "ts")
    val rf = Seasonal.seasonalNaiveSkill(flat, "key", "ts", period = 2).collect().head
    assert(rf.isNullAt(rf.fieldIndex("skill")))
  }

  // ------------------------------------------------------- lmQualityBuckets

  test("lmQualityBuckets: common-word docs land in the head bucket") {
    // 'aa' dominates the corpus; docs of rare singleton words land in tail
    val docs = (Seq.tabulate(6)(i => (i.toLong, "en", "aa aa aa")) ++
      Seq((10L, "en", "zq xv"), (11L, "en", "pw mt"), (12L, "en", "kj fh")))
      .toDF("doc_id", "lang", "text")
    val out = Tfidf.lmQualityBuckets(docs, "lang", nBuckets = 3).collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L).getAs[Double]("mean_lp") > out(3L).getAs[Double]("mean_lp"),
      "bucket 1 = highest LM score (head)")
    assert(out.values.map(_.getAs[Long]("n_docs")).sum == 9L)
    // empty docs are absent, not a bucket of NULLs
    val withEmpty = docs.unionAll(Seq((99L, "en", "???")).toDF("doc_id", "lang", "text"))
    assert(Tfidf.lmQualityBuckets(withEmpty, "lang", 3)
      .agg(sum("n_docs")).collect().head.getLong(0) == 9L)
  }

  // ------------------------------------------------------ boilerplateReport

  test("boilerplateReport: stamped footer found, per-doc repeats count once") {
    val docs = Seq(
      (1L, "s", "alpha\nfooter co"), (2L, "s", "beta\nfooter co\nfooter co"),
      (3L, "s", "gamma\nfooter co"), (4L, "s", "delta"),
      (5L, "t", "x\ny")).toDF("doc_id", "source", "text")
    val out = LineDedup.boilerplateReport(docs, "doc_id", "text", "source",
      minDocs = 3L, topK = 5).collect()
    assert(out.length == 1, s"only the footer crosses minDocs: ${out.mkString(";")}")
    val r = out.head
    assert(r.getAs[String]("group") == "s" && r.getAs[String]("line") == "footer co")
    assert(r.getAs[Long]("n_docs") == 3L, "doc 2's double stamp counts once")
    assert(r.getAs[Long]("rank") == 1L)
  }

  // ------------------------------------------------------------ lDiversity

  test("lDiversity: homogeneous k-large classes are flagged") {
    // class A: 4 rows but ONE sensitive value (k-anonymous, 1-diverse);
    // class B: 3 rows, 3 values
    val df = (Seq.fill(4)(("A", "x")) ++ Seq(("B", "x"), ("B", "y"), ("B", "z")))
      .toDF("quasi", "sens")
    val r = Integrity.lDiversity(df, Seq("quasi"), "sens", l = 2L).collect().head
    assert(r.getAs[Long]("n_classes") == 2L)
    assert(r.getAs[Long]("n_classes_below_l") == 1L)
    assert(r.getAs[Long]("n_rows_at_risk") == 4L)
    assert(r.getAs[Long]("min_diversity") == 1L)
    assert(math.abs(r.getAs[Double]("frac_at_risk") - 4.0 / 7.0) < 1e-9)
  }

  // ------------------------------------------------------------ itemCosine

  test("itemCosine: textbook cosine and the power-user cap") {
    // u1: a(2), b(1); u2: a(1), b(1); dot = 2+1 = 3, ||a||=sqrt5 ||b||=sqrt2
    val ix = (Seq.fill(2)((1L, "a")) ++ Seq((1L, "b"), (2L, "a"), (2L, "b")))
      .toDF("u", "i")
    val r = Recommend.itemCosine(ix, "u", "i", minUsers = 1L).collect().head
    assert(r.getAs[String]("item_a") == "a" && r.getAs[String]("item_b") == "b")
    assert(r.getAs[Long]("n_users") == 2L)
    assert(math.abs(r.getAs[Double]("cosine") - 3.0 / math.sqrt(10.0)) < 1e-9)
    // a user touching more than maxItemsPerUser distinct items drops whole
    val spam = (1 to 5).map(i => (9L, s"i$i")).toDF("u", "i")
    assert(Recommend.itemCosine(ix.unionAll(spam), "u", "i",
      minUsers = 1L, maxItemsPerUser = 4).collect().length == 1,
      "capped user contributes no pairs")
  }

  // ------------------------------------------------------------------- lof

  test("lof: an isolated point scores above the cluster") {
    // 8 points on a tight 2D-ish grid (padded to 4 dims) + one far point
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat, 0f, 0f)
    val pts = Seq(
      (0L, v(0, 0)), (1L, v(0, 1)), (2L, v(1, 0)), (3L, v(1, 1)),
      (4L, v(0, 2)), (5L, v(2, 0)), (6L, v(2, 1)), (7L, v(1, 2)),
      (8L, v(30, 30))).toDF("vec_id", "embedding")
    val out = Lof.lof(pts, k = 3).collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.size == 9)
    val outlier = out(8L).getAs[Double]("lof")
    val clusterMax = (0L to 7L).map(i => out(i).getAs[Double]("lof")).max
    assert(outlier > 5.0 && outlier > 3 * clusterMax,
      s"far point must dominate: outlier=$outlier clusterMax=$clusterMax")
    // cluster members sit near density parity
    assert(clusterMax < 2.0)
  }

  test("lof: >= k duplicates yield NULL lrd/lof, not infinity") {
    def v(x: Double) = Array(x.toFloat, 0f, 0f, 0f)
    val dup = Seq((0L, v(0)), (1L, v(0)), (2L, v(0)), (3L, v(5)))
      .toDF("vec_id", "embedding")
    val out = Lof.lof(dup, k = 2).collect().map(r => r.getAs[Long]("id") -> r).toMap
    // points 0,1,2 coincide: their 2-NN distances are 0 -> mean reach 0
    (0L to 2L).foreach { i =>
      assert(out(i).isNullAt(out(i).fieldIndex("lrd")), s"dup $i lrd NULL")
      assert(out(i).isNullAt(out(i).fieldIndex("lof")), s"dup $i lof NULL")
    }
  }

  test("lof: a NULL-lrd neighbor propagates NULL lof, never a biased mean") {
    // family of 3 exact dupes at x=0 (NULL lrd each), P at 1, Q at 1.5;
    // P's 2-NN = {Q, one dup} — mixed neighbors. Averaging only the
    // non-NULL ratio over count(*)=2 would bias LOF low; the contract is
    // NULL-on-degenerate, so any NULL neighbor lrd makes lof NULL.
    def v(x: Double) = Array(x.toFloat, 0f, 0f, 0f)
    val pts = Seq((0L, v(0)), (1L, v(0)), (2L, v(0)), (3L, v(1)), (4L, v(1.5)))
      .toDF("vec_id", "embedding")
    val out = Lof.lof(pts, k = 2).collect().map(r => r.getAs[Long]("id") -> r).toMap
    Seq(3L, 4L).foreach { i =>
      assert(!out(i).isNullAt(out(i).fieldIndex("lrd")), s"point $i lrd defined")
      assert(out(i).isNullAt(out(i).fieldIndex("lof")),
        s"point $i borders a duplicate family: lof must be NULL")
    }
  }

  test("lofWithCandidates: a complete candidate set is bit-identical to exact lof") {
    // +1 translation keeps Euclidean geometry and avoids the zero vector
    // (bucketedTopK's cosine ranking divides by the norm)
    def v(x: Double, y: Double) = Array(x.toFloat + 1f, y.toFloat + 1f, 1f, 1f)
    val pts = Seq(
      (0L, v(0, 0)), (1L, v(0, 1)), (2L, v(1, 0)), (3L, v(1, 1)),
      (4L, v(0, 2)), (5L, v(2, 0)), (6L, v(2, 1)), (7L, v(1, 2)),
      (8L, v(30, 30))).toDF("vec_id", "embedding")
    // IVF plumbing as the generator: one coarse cell = complete candidates
    val cands = graft.ann.Similarity.bucketedTopK(pts, pts, k = 8, cell = _ => lit(0))
      .select(col("query_id").as("id"), col("neighbor_id").as("nb"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("k_dist"), Option(r.get(r.fieldIndex("lrd"))),
          Option(r.get(r.fieldIndex("lof"))))).toMap
    val exact = asMap(Lof.lof(pts, k = 3))
    val approx = asMap(Lof.lofWithCandidates(pts, k = 3, cands))
    assert(exact == approx, "complete candidates must reproduce exact LOF bit-for-bit")
  }

  test("selfProbeCandidates: unique pairs; full probe coverage reproduces exact lof") {
    // mixed first-dim signs so nBits = 1 splits the corpus across both
    // cells; radius 1 probes BOTH half-spaces -> complete candidate set
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat, 1f, 1f)
    val pts = Seq(
      (0L, v(-2, 0)), (1L, v(-2, 1)), (2L, v(-1, 0)), (3L, v(-1, 1)),
      (4L, v(1, 0)), (5L, v(1, 1)), (6L, v(2, 0)), (7L, v(2, 1)),
      (8L, v(30, 30))).toDF("vec_id", "embedding")
    val cands = Lof.selfProbeCandidates(pts, nBits = 1, probeRadius = 1)
    // pairs are unique by construction (distinct XOR masks x one cell
    // per corpus vector) — the contract pairsDistinct = true relies on
    assert(cands.count() == 9L * 8L, "complete + unique candidate pairs")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("k_dist"), Option(r.get(r.fieldIndex("lrd"))),
          Option(r.get(r.fieldIndex("lof"))))).toMap
    val exact = asMap(Lof.lof(pts, k = 3))
    val scal = asMap(Lof.lofWithCandidates(pts, k = 3, cands, pairsDistinct = true))
    assert(exact == scal, "full-coverage probe candidates must reproduce exact LOF bit-for-bit")
  }

  test("lofWithCandidates: duplicate candidate pairs dedupe; < k candidates raises") {
    def v(x: Double) = Array(x.toFloat, 0f, 0f, 0f)
    val pts = Seq((0L, v(0)), (1L, v(1)), (2L, v(2)), (3L, v(4))).toDF("vec_id", "embedding")
    val full = for { a <- 0L to 3L; b <- 0L to 3L if a != b } yield (a, b)
    // each pair emitted twice (a multi-probe generator sharing 2 cells)
    val dup = (full ++ full).toDF("id", "nb")
    val exact = Lof.lof(pts, k = 2).collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("lof")).toMap
    val got = Lof.lofWithCandidates(pts, k = 2, dup).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("lof")).toMap
    assert(exact == got, "duplicate candidate pairs must not double-fill the heap")
    // point 3 gets only ONE candidate -> truncated neighborhood must raise
    val short = (full.filterNot(_._1 == 3L) :+ ((3L, 2L))).toDF("id", "nb")
    val ex = intercept[Exception] {
      Lof.lofWithCandidates(pts, k = 2, short).collect()
    }
    val messages = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(messages.contains("fewer than k"), messages)
  }
}
