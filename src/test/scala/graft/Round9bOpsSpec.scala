package graft

import graft.operators.{AsofJoin, Attribution, Discontinuity, Retention}
import graft.text.Bm25
import org.apache.spark.sql.functions._

/** Round-9 batch P: Shapley attribution, growth accounting, sharp RDD,
  * nearest-direction as-of join, BM25 proximity boost.
  */
class Round9bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000L)

  // ------------------------------------------------------------- shapley
  test("shapleyAttribution: textbook two-channel game; empty-set baseline earns nobody credit") {
    // u1: A->conv, u2: B->conv, u3: A,B->conv, u4: A (no conv)
    val ev = Seq(
      (1L, t(1), "A", 1L), (1L, t(2), "conv", 2L),
      (2L, t(1), "B", 3L), (2L, t(2), "conv", 4L),
      (3L, t(1), "A", 5L), (3L, t(2), "B", 6L), (3L, t(3), "conv", 7L),
      (4L, t(1), "A", 8L)
    ).toDF("u", "ts", "et", "id")
    val got = Attribution.shapleyAttribution(ev, "u", "ts", "et", "id", "conv")
      .collect().map(r => r.getAs[String]("channel") -> r).toMap
    // v({A})=1, v({B})=1, v({A,B})=3 -> phi_A = phi_B = 1.5, shares 0.5
    assert(got("A").getAs[Double]("shapley") == 1.5)
    assert(got("B").getAs[Double]("shapley") == 1.5)
    assert(got("A").getAs[Double]("share") == 0.5)
    assert(got("A").getAs[Long]("v_full") == 3L && got("A").getAs[Long]("v_empty") == 0L)
    // a conversion with NO prior channel raises every v(S) equally ->
    // identical phis, visible via v_empty
    val withBase = ev.union(Seq((5L, t(1), "conv", 9L)).toDF("u", "ts", "et", "id"))
    val got2 = Attribution.shapleyAttribution(withBase, "u", "ts", "et", "id", "conv")
      .collect().map(r => r.getAs[String]("channel") -> r).toMap
    assert(got2("A").getAs[Double]("shapley") == 1.5)
    assert(got2("A").getAs[Long]("v_empty") == 1L && got2("A").getAs[Long]("v_full") == 4L)
    intercept[IllegalArgumentException] {
      Attribution.shapleyAttribution(ev, "u", "ts", "et", "id", "conv", maxChannels = 1)
    }
  }

  // ------------------------------------------------------- growth accounting
  test("growthAccounting: new/retained/resurrected/churned partition the actives") {
    // u1: p0,p1,p3; u2: p0; u3: p2,p3   (1-second buckets)
    val ev = Seq(
      (1L, t(0)), (1L, t(1)), (1L, t(3)),
      (2L, t(0)),
      (3L, t(2)), (3L, t(3))
    ).toDF("u", "ts")
    val got = Retention.growthAccounting(ev, "u", "ts", bucketUs = 1000000L)
      .collect().map(r => r.getAs[Long]("period") -> r).toMap
    def row(p: Long) = (got(p).getAs[Long]("n_active"), got(p).getAs[Long]("n_new"),
      got(p).getAs[Long]("n_retained"), got(p).getAs[Long]("n_resurrected"),
      got(p).getAs[Long]("n_churned"))
    assert(row(0L) == ((2L, 2L, 0L, 0L, 0L)))
    assert(row(1L) == ((1L, 0L, 1L, 0L, 1L))) // u2 churned into p1
    assert(row(2L) == ((1L, 1L, 0L, 0L, 1L))) // u1 gap -> churned into p2
    assert(row(3L) == ((2L, 0L, 1L, 1L, 0L))) // u1 resurrected, u3 retained
    assert(got(1L).getAs[Double]("quick_ratio") == 0.0)
    assert(got(2L).getAs[Double]("quick_ratio") == 1.0)
    assert(got(3L).isNullAt(got(3L).fieldIndex("quick_ratio")), "churn 0 -> NULL ratio")
    // the unknown future never reports churn: no period-4 row at all
    assert(!got.contains(4L))
  }

  // ------------------------------------------------------------------ rdd
  test("sharpRdd: recovers the intercept jump on exact linear sides; degenerate side is NULL-sloped") {
    val left = Seq(-3.0, -2.0, -1.0).map(u => (u + 10.0, 2.0 + 0.5 * u))
    val rightPts = Seq(0.0, 1.0, 2.0).map(u => (u + 10.0, 5.0 + u))
    val df = (left ++ rightPts).toDF("x", "y")
    val r = Discontinuity.sharpRdd(df, "x", "y", cutoff = 10.0, bandwidth = 5.0)
      .collect().head
    assert(r.getAs[Long]("n_left") == 3L && r.getAs[Long]("n_right") == 3L)
    assert(r.getAs[Double]("intercept_left") == 2.0 && r.getAs[Double]("slope_left") == 0.5)
    assert(r.getAs[Double]("intercept_right") == 5.0 && r.getAs[Double]("slope_right") == 1.0)
    assert(r.getAs[Double]("effect") == 3.0)
    // all right mass AT the cutoff: slope NULL, intercept = side mean
    val deg = (left ++ Seq((10.0, 4.0), (10.0, 6.0))).toDF("x", "y")
    val d = Discontinuity.sharpRdd(deg, "x", "y", 10.0, 5.0).collect().head
    assert(d.isNullAt(d.fieldIndex("slope_right")))
    assert(d.getAs[Double]("intercept_right") == 5.0)
  }

  // --------------------------------------------------------- asof nearest
  test("asof nearest: closer side wins, ties backward, tolerance nulls both") {
    val left = Seq((1L, "k", 10L), (2L, "k", 50L), (3L, "k", 59L), (4L, "k", 100L))
      .toDF("lid", "k", "t")
    val right = Seq(("k", 0L, 1.0), ("k", 18L, 2.0), ("k", 68L, 3.0), ("k", 100L, 4.0))
      .toDF("k", "t", "v")
    def run(tol: Option[Long]) = AsofJoin.asof(
      left, right, on = Seq("k"), leftTimeCol = "t", rightTimeCol = "t",
      rightCols = Seq("v"), direction = AsofJoin.Nearest, toleranceUs = tol)
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.get(r.fieldIndex("matched_v")))).toMap
    val got = run(None)
    assert(got(1L).contains(2.0), "t=10: forward 18 (d8) beats backward 0 (d10)")
    assert(got(2L).contains(3.0), "t=50: forward 68 (d18) beats backward 18 (d32)")
    assert(got(3L).contains(3.0), "t=59: d9 both sides... backward is 18? no: backward=18 d41, fwd=68 d9")
    assert(got(4L).contains(4.0), "t=100: equal-time right at distance 0")
    val tight = run(Some(5L))
    assert(tight(1L).isEmpty, "tolerance 5 excludes both candidates at t=10")
    assert(tight(4L).contains(4.0), "distance 0 always inside tolerance")
  }

  test("asof nearest: exact distance tie goes backward") {
    val left = Seq((1L, "k", 59L)).toDF("lid", "k", "t")
    val right = Seq(("k", 50L, 1.0), ("k", 68L, 2.0)).toDF("k", "t", "v")
    val got = AsofJoin.asof(left, right, Seq("k"), "t", "t", Seq("v"),
      direction = AsofJoin.Nearest).collect().head
    assert(got.getAs[Double]("matched_v") == 1.0, "d=9 both ways: backward wins")
  }

  // ------------------------------------------------------------ proximity
  test("minPairSpan + scoreWithProximity: consecutive cross-term gap, absent without co-occurrence") {
    val docs = Seq(
      (1L, "spark x hash"), // spark@0, hash@2 -> span 2
      (2L, "spark only here"), // one query term -> no span row
      (3L, "hash hash spark") // hash@1 -> spark@2: span 1
    ).toDF("doc_id", "text")
    val spans = Bm25.minPairSpan(docs, Seq("spark", "hash", "merge")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("min_span")).toMap
    assert(spans == Map(1L -> 2L, 3L -> 1L))
    val prox = Bm25.scoreWithProximity(docs, Seq("spark", "hash", "merge"), lambda = 2.0)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(prox(2L).isNullAt(prox(2L).fieldIndex("min_span")))
    assert(prox(2L).getAs[Double]("bm25_prox") == prox(2L).getAs[Double]("bm25"),
      "no co-occurrence -> no boost")
    val d3 = prox(3L)
    assert(math.abs(d3.getAs[Double]("bm25_prox") - (d3.getAs[Double]("bm25") + 1.0)) < 2e-6,
      "span 1 -> boost lambda/(1+1) = 1")
  }
}
