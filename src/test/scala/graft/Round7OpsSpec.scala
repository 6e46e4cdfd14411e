package graft

import graft.operators.{Integrity, Seasonal, Stats}
import graft.pipeline.Selection
import org.apache.spark.sql.functions._

/** Round-7 operators: t-closeness, periodogram/dominant period, Pareto
  * frontier, covariate balance.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ tCloseness

  test("tCloseness: mirrored classes are 0-distant, a homogeneous class leaks") {
    // two classes, global lang mix 50/50; class A mirrors it (d=0),
    // class B is 100% 'en' (TVD vs 50/50 = 0.5)
    val df = (Seq.fill(10)(("A", "en")) ++ Seq.fill(10)(("A", "de")) ++
      Seq.fill(20)(("B", "en"))).toDF("cls", "lang")
    // global: en 30/40 = .75, de 10/40 = .25
    // class A: en .5, de .5 -> TVD = .5*(|.5-.75|+|.5-.25|) = .25
    // class B: en 1.0 -> TVD = .5*(|1-.75| + .25) = .25
    val r = Integrity.tCloseness(df, Seq("cls"), "lang", t = 0.2).collect().head
    assert(r.getAs[Long]("n_rows") == 40L && r.getAs[Long]("n_classes") == 2L)
    assert(math.abs(r.getAs[Double]("max_distance") - 0.25) < 1e-6)
    assert(r.getAs[Long]("n_classes_above_t") == 2L)
    assert(r.getAs[Long]("n_rows_at_risk") == 40L)
    // identical-to-global classes pass any t
    val mirror = (Seq.fill(3)(("A", "en")) ++ Seq.fill(1)(("A", "de")) ++
      Seq.fill(6)(("B", "en")) ++ Seq.fill(2)(("B", "de"))).toDF("cls", "lang")
    val m = Integrity.tCloseness(mirror, Seq("cls"), "lang", t = 0.1).collect().head
    assert(m.getAs[Double]("max_distance") == 0.0)
    assert(m.getAs[Long]("n_classes_above_t") == 0L)
  }

  test("tCloseness: NULL sensitive values are a real category; NULL quasi a real class") {
    val df = Seq(("A", "en"), ("A", null), (null, "en"), (null, null))
      .toDF("cls", "lang")
    val r = Integrity.tCloseness(df, Seq("cls"), "lang", t = 0.5).collect().head
    assert(r.getAs[Long]("n_rows") == 4L, "no row drops from NULL keys or values")
    assert(r.getAs[Long]("n_classes") == 2L)
  }

  // ----------------------------------------------------------- periodogram

  private def hourly(key: String, vals: Seq[Int]) =
    vals.zipWithIndex.flatMap { case (n, h) =>
      Seq.fill(n)((key, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(3600L * h))))
    }.toDF("k", "ts")

  test("periodogram: a pure 12h cycle wins at period 12") {
    // 4 days of 12-hour square wave: 5 events at even phases 0..5, 1 at 6..11
    val df = hourly("a", (0 until 96).map(h => if (h % 12 < 6) 5 else 1))
    val pg = Seasonal.periodogram(df, "k", "ts", minPeriod = 2, maxPeriod = 24)
      .collect()
    val winner = pg.find(_.getAs[Int]("rk") == 1).get
    assert(winner.getAs[Int]("period") == 12, s"got ${winner.getAs[Int]("period")}")
    val dom = Seasonal.dominantPeriod(df, "k", "ts", 2, 24).collect().head
    assert(dom.getAs[Int]("dominant_period") == 12)
    assert(dom.getAs[Double]("power_share") > 0.3)
    assert(dom.getAs[Double]("spectral_entropy") < 0.8)
  }

  test("periodogram: constant series carries no power anywhere") {
    val df = hourly("a", Seq.fill(48)(3))
    val pg = Seasonal.periodogram(df, "k", "ts", 2, 12).collect()
    assert(pg.forall(_.getAs[Double]("power") == 0.0))
    val dom = Seasonal.dominantPeriod(df, "k", "ts", 2, 12).collect().head
    // zero total mass -> NULL share, entropy 0 by contract
    assert(dom.isNullAt(dom.fieldIndex("power_share")))
    assert(dom.getAs[Double]("spectral_entropy") == 0.0)
  }

  test("periodogram: calendar gaps keep phase (t is epoch-derived, not rank)") {
    // same 12h wave but hours 10..13 silent; t must stay calendar-true
    val vals = (0 until 48).map(h => if (h >= 10 && h <= 13) 0 else if (h % 12 < 6) 5 else 1)
    val df = hourly("a", vals)
    val pg = Seasonal.periodogram(df, "k", "ts", 2, 24).collect()
    assert(pg.find(_.getAs[Int]("rk") == 1).get.getAs[Int]("period") == 12)
  }

  // -------------------------------------------------------- paretoFrontier

  test("paretoFrontier: dominance, strictness, ties") {
    val df = Seq(
      (1L, 10.0, 5.0),  // frontier (cheapest)
      (2L, 20.0, 9.0),  // frontier
      (3L, 20.0, 7.0),  // dominated by 2 (same cost, lower quality)
      (4L, 30.0, 9.0),  // dominated by 2 (same quality, higher cost)
      (5L, 30.0, 12.0), // frontier
      (6L, 25.0, 4.0),  // dominated by 1
      (7L, 30.0, 12.0)  // exact tie with 5 -> both kept
    ).toDF("id", "cost", "q")
    val kept = Selection.paretoFrontier(df, "cost", "q")
      .collect().map(_.getAs[Long]("id")).sorted
    assert(kept.toSeq == Seq(1L, 2L, 5L, 7L), s"got ${kept.toSeq}")
  }

  test("paretoFrontier: NULL/NaN rows never reach the frontier") {
    val df = Seq(
      (1L, Some(10.0), Some(5.0)),
      (2L, None, Some(99.0)),
      (3L, Some(1.0), None),
      (4L, Some(Double.NaN), Some(99.0))
    ).toDF("id", "cost", "q")
    val kept = Selection.paretoFrontier(df, "cost", "q")
      .collect().map(_.getAs[Long]("id"))
    assert(kept.toSeq == Seq(1L))
  }

  test("paretoFrontier: a continuous cost column past the cap fails loudly") {
    // 50 distinct double costs against a cap of 10 — the bounded-domain
    // contract must raise, not funnel the corpus through one window task
    val df = (1 to 50).map(i => (i.toLong, i + 0.5, i.toDouble)).toDF("id", "cost", "q")
    val ex = intercept[Exception] {
      Selection.paretoFrontier(df, "cost", "q", maxDistinctCosts = 10).collect()
    }
    val messages = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(messages.contains("distinct cost values"),
      s"expected the paretoFrontier cap error, got: $messages")
  }

  test("paretoFrontier: costBuckets quantizes a continuous cost under the cap") {
    // same 50 continuous costs, bucketed to width 10 -> 6 distinct
    // bucket costs, well under the cap; frontier = best quality per
    // bucket with the running strict-max across buckets
    val df = (1 to 50).map(i => (i.toLong, i + 0.5, i.toDouble)).toDF("id", "cost", "q")
    val kept = Selection.paretoFrontier(df, "cost", "q",
        maxDistinctCosts = 10, costBuckets = Some(10.0))
      .collect().map(_.getAs[Long]("id")).sorted
    // quality is monotone in cost here, so the frontier is the max-q
    // row of each bucket: ids 9 (bucket [0,10)), 19, 29, 39, 49, 50
    assert(kept.toSeq == Seq(9L, 19L, 29L, 39L, 49L, 50L), s"got ${kept.toSeq}")
  }

  // ------------------------------------------------- truncationFidelity

  test("truncationFidelity: full dim is perfect, a dead prefix degrades") {
    // first 2 dims identical everywhere (prefix carries NO signal);
    // dims 3-4 separate the vectors
    def v(a: Double, b: Double) = Array(1f, 1f, a.toFloat, b.toFloat)
    val corpus = Seq(
      (0L, v(1, 0)), (1L, v(0.9, 0.1)), (2L, v(0.8, 0.2)),
      (3L, v(0, 1)), (4L, v(0.1, 0.9)), (5L, v(0.2, 0.8))
    ).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0L)
    val out = graft.ann.Embeddings
      .truncationFidelity(corpus, queries, k = 2, dims = Seq(2, 4))
      .collect().map(r => r.getAs[Long]("dim").toInt -> r).toMap
    assert(out(4).getAs[Double]("mean_recall") == 1.0, "full prefix = exact search")
    // at d=2 every cosine ties at 1.0 -> top-2 by id = {1,2}; full top-2
    // of query 0 is {1,2} too (closest in dims 3-4) -> recall still 1;
    // make the full winners be {3,4} instead by flipping the query
    val q2 = Seq((9L, v(0, 1))).toDF("vec_id", "embedding")
    val out2 = graft.ann.Embeddings
      .truncationFidelity(corpus, q2, k = 2, dims = Seq(2, 4))
      .collect().map(r => r.getAs[Long]("dim").toInt -> r).toMap
    assert(out2(4).getAs[Double]("mean_recall") == 1.0)
    // d=2: all-tie -> ids {0,1} selected; full top-2 = {3,4} -> recall 0
    assert(out2(2).getAs[Double]("mean_recall") == 0.0)
    assert(out2(2).getAs[Long]("n_queries") == 1L)
  }

  test("truncationFidelity: cost columns, empty queries, oversized dim") {
    def v(a: Double, b: Double) = Array(1f, 1f, a.toFloat, b.toFloat)
    val corpus = Seq(
      (0L, v(1, 0)), (1L, v(0.9, 0.1)), (2L, v(0.8, 0.2)),
      (3L, v(0, 1)), (4L, v(0.1, 0.9)), (5L, v(0.2, 0.8))
    ).toDF("vec_id", "embedding")
    // cost side: floats_per_query = dim × corpus size, on the same row
    val row = graft.ann.Embeddings
      .truncationFidelity(corpus, corpus.limit(1), k = 2, dims = Seq(2))
      .collect().head
    assert(row.getAs[Long]("n_corpus") == 6L)
    assert(row.getAs[Long]("floats_per_query") == 12L)
    // zero queries -> zero rows (GROUP BY semantics, matching any SQL
    // oracle), never a one-row NULL-recall artifact
    val empty = graft.ann.Embeddings
      .truncationFidelity(corpus, corpus.filter(col("vec_id") < 0), k = 2, dims = Seq(2, 4))
    assert(empty.count() == 0L)
    // a prefix longer than the embedding raises (slice would silently
    // search the full vector and report fake-perfect recall)
    val ex = intercept[Exception] {
      graft.ann.Embeddings
        .truncationFidelity(corpus, corpus.limit(1), k = 2, dims = Seq(8)).collect()
    }
    val messages = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(messages.contains("exceeds the embedding dimension"), messages)
  }

  // ---------------------------------------------------------------- rake

  test("rake: phrases split at stopwords, scores are deg/freq sums") {
    val stop = Seq("the", "and", "of")
    val df = Seq(
      (1L, "g", "the quick brown fox and the lazy dog"),
      (2L, "g", "the lazy dog")
    ).toDF("doc_id", "source", "text")
    val out = graft.text.Keywords.rake(df, "source", "doc_id", stop, topN = 10)
      .collect().map(r => r.getAs[String]("phrase") -> r).toMap
    assert(out.keySet == Set("quick brown fox", "lazy dog"))
    // word stats: quick/brown/fox freq 1 deg 3 -> score 3*3=9
    // lazy/dog freq 2, deg 2+2=4 -> score 2*(4/2)=4
    assert(math.abs(out("quick brown fox").getAs[Double]("score") - 9.0) < 1e-6)
    assert(math.abs(out("lazy dog").getAs[Double]("score") - 4.0) < 1e-6)
    assert(out("lazy dog").getAs[Long]("n_occurrences") == 2L)
    assert(out("quick brown fox").getAs[Long]("n_words") == 3L)
    assert(out("quick brown fox").getAs[Long]("rk") == 1L)
  }

  test("rake: overlong stopword-free runs drop whole; topN caps per group") {
    val stop = Seq("the")
    val df = Seq(
      (1L, "g", "alpha beta gamma delta epsilon the lazy dog")
    ).toDF("doc_id", "source", "text")
    val out = graft.text.Keywords.rake(df, "source", "doc_id", stop,
      topN = 1, maxLen = 4).collect()
    // the 5-token run is dropped entirely; only 'lazy dog' remains
    assert(out.map(_.getAs[String]("phrase")).toSeq == Seq("lazy dog"))
  }

  // ----------------------------------------------------- covariateBalance

  test("covariateBalance: hand-computed SMD and variance ratio") {
    // arm A: x in {1,2,3} (mean 2, var 1); arm B: x in {3,4,5} (mean 4, var 1)
    // smd = (4-2)/sqrt((1+1)/2) = 2; ratio = 1
    val df = Seq((1.0, false), (2.0, false), (3.0, false),
      (3.0, true), (4.0, true), (5.0, true)).toDF("x", "b")
    val r = Stats.covariateBalance(df, Seq("x"), col("b")).collect().head
    assert(r.getAs[String]("covariate") == "x")
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(math.abs(r.getAs[Double]("smd") - 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("variance_ratio") - 1.0) < 1e-6)
  }

  test("covariateBalance: multiple covariates in one pass, per-covariate NULLs") {
    val df = Seq(
      (Some(1.0), Some(10.0), false), (Some(3.0), None, false),
      (Some(2.0), Some(10.0), true), (Some(4.0), Some(30.0), true))
      .toDF("x", "y", "b")
    val rows = Stats.covariateBalance(df, Seq("x", "y"), col("b"))
      .collect().map(r => r.getAs[String]("covariate") -> r).toMap
    assert(rows.keySet == Set("x", "y"))
    // y's arm A has only 1 non-null row -> no variance -> NULL smd
    assert(rows("y").getAs[Long]("n_a") == 1L)
    assert(rows("y").isNullAt(rows("y").fieldIndex("smd")))
    assert(rows("x").getAs[Long]("n_a") == 2L && rows("x").getAs[Long]("n_b") == 2L)
    // degenerate equal-mean zero-variance arms -> smd 0
    val const = Seq((5.0, false), (5.0, false), (5.0, true), (5.0, true)).toDF("x", "b")
    val c = Stats.covariateBalance(const, Seq("x"), col("b")).collect().head
    assert(c.getAs[Double]("smd") == 0.0)
    assert(c.isNullAt(c.fieldIndex("variance_ratio")))
  }
}
