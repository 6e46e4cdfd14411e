package graft

import graft.operators.{Attribution, Retention, Trend}
import graft.text.Lexical
import org.apache.spark.sql.functions._

/** Round-10 batch V: U-shaped attribution, cohort LTV, Yule's K,
  * Luhn scan, ERR@k, SAX words.
  */
class Round10bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("positionAttribution: 40/20/40 with the degenerate-path conventions") {
    val ev = Seq(
      (1L, t(0), "A", 1L), (1L, t(1), "B", 2L), (1L, t(2), "C", 3L),
      (1L, t(3), "D", 4L), (1L, t(4), "conv", 5L),
      (2L, t(0), "X", 6L), (2L, t(1), "conv", 7L), // one touch: full credit
      (3L, t(0), "X", 8L), (3L, t(1), "Y", 9L), (3L, t(2), "conv", 10L) // two: half each
    ).toDF("u", "ts", "et", "id")
    val got = Attribution.positionAttribution(ev, "u", "ts", "et", "id", "conv")
      .collect().map(r => r.getAs[String]("channel") -> r.getAs[Double]("total_credit")).toMap
    assert(got("A") == 0.4 && got("D") == 0.4)
    assert(got("B") == 0.1 && got("C") == 0.1)
    assert(got("X") == 1.5, "1.0 from the solo journey + 0.5 from the pair")
    assert(got("Y") == 0.5)
  }

  test("ltvCurve: cumulative revenue per cohort member by age") {
    def wk(w: Long, s: Long) = new java.sql.Timestamp(w * 7L * 86400000L + s * 1000L + 345600000L)
    // epoch 0 is a Thursday; +4d aligns to a Monday so weeks don't straddle
    val ev = Seq(
      (1L, wk(0, 10), 10.0), (2L, wk(0, 20), 30.0), // cohort week 0, age 0: 40 over 2 users
      (1L, wk(1, 10), 6.0) // age 1: +6 -> cum 46 / 2 users = 23
    ).toDF("u", "ts", "v")
    val got = Retention.ltvCurve(ev, "u", "ts", "v")
      .collect().map(r => r.getAs[Long]("age_weeks") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_active"),
          r.getAs[Double]("revenue"), r.getAs[Double]("cum_revenue_per_user"))).toMap
    assert(got(0L) == ((2L, 2L, 40.0, 20.0)))
    assert(got(1L) == ((2L, 1L, 6.0, 23.0)))
  }

  test("yuleK: the frequency spectrum constant, exact on a tiny corpus") {
    // tokens: a a a b -> N=4, V1=1, V3=1, sum m^2 Vm = 10 -> K = 1e4*6/16
    val df = Seq(("s", "a a a b")).toDF("src", "text")
    val got = Lexical.yuleK(df, Seq("src")).collect()(0)
    assert(got.getAs[Long]("n_tokens") == 4L && got.getAs[Long]("n_types") == 2L)
    assert(got.getAs[Double]("yule_k") == 3750.0)
  }

  test("luhnValid/luhnScan: the classic test PAN validates, off-by-one fails") {
    val df = Seq(
      (1L, "pay 4111111111111111 now 123"),
      (2L, "ref 4111111111111112 x"),
      (3L, "no digits here")).toDF("doc_id", "text")
    val got = Lexical.luhnScan(df).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_luhn_valid"))).toMap
    assert(got(1L) == ((1L, 1L)), "4111... is Luhn-valid; '123' is too short to be a candidate")
    assert(got(2L) == ((1L, 0L)))
    assert(!got.contains(3L), "docs with no candidates emit no row")
  }

  test("errAtK: cascade credit halves per prior relevant hit") {
    val ranking = Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L),
      ("q2", 9L, 1L)).toDF("query_id", "doc_id", "rank")
    val rel = Seq(("q", 1L), ("q", 3L)).toDF("query_id", "id")
    val got = graft.text.RetrievalEval.errAtK(ranking, rel, k = 10)
      .collect().map(r => r.getAs[String]("query_id") ->
        (r.getAs[Long]("n_relevant"), r.getAs[Double]("err_at_k"))).toMap
    // 0.5/1 + 0.25/3 = 0.583333
    assert(got("q") == ((2L, 0.583333)))
    assert(got("q2") == ((0L, 0.0)), "no relevant docs scores 0, not NULL")
  }

  test("sax: a step series z-normalizes to the extreme letters") {
    val df = Seq(
      ("k", t(0), 1L, 0.0), ("k", t(1), 2L, 0.0),
      ("k", t(2), 3L, 10.0), ("k", t(3), 4L, 10.0)).toDF("g", "ts", "id", "v")
    val got = Trend.sax(df, Seq("g"), "ts", "id", "v", nSegments = 2).collect()(0)
    assert(got.getAs[Long]("n") == 4L)
    assert(got.getAs[String]("sax") == "ad", "z = (-1,-1,+1,+1) -> segments a, d")
  }

  test("sax: a flat series is all-'c' by the zero-variance convention") {
    val df = (0 until 8).map(i => ("k", t(i.toLong), i.toLong, 5.0)).toDF("g", "ts", "id", "v")
    assert(Trend.sax(df, Seq("g"), "ts", "id", "v", nSegments = 4)
      .collect()(0).getAs[String]("sax") == "cccc")
  }
}
