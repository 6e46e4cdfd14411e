package graft

import graft.operators.{Attribution, Logistic}
import graft.text.{Concordance, LmEval}
import org.apache.spark.sql.functions._

/** Round-8 batch H: KWIC, held-out perplexity, AIPW, Markov removal. */
class BatchHSpec extends SparkSpec {
  import spark.implicits._

  // ---- KWIC ----

  test("kwic: edge positions get truncated contexts, never NULLs") {
    val docs = Seq(
      (1L, "spark reads parquet fast"), // term at position 0
      (2L, "we tune the big spark"), // term at the end
      (3L, "a b c spark d e f g")).toDF("id", "text")
    val out = Concordance.kwic(docs, "id", "text", "spark", k = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("pos"), r.getAs[String]("left_ctx"), r.getAs[String]("right_ctx"))).toMap
    assert(out(1L) == ((0L, "", "reads parquet fast")))
    assert(out(2L) == ((4L, "tune the big", "")))
    assert(out(3L) == ((3L, "a b c", "d e f")))
  }

  test("kwic: one row per occurrence, none for absent terms") {
    val docs = Seq((1L, "x spark y spark z"), (2L, "nothing here")).toDF("id", "text")
    val rows = Concordance.kwic(docs, "id", "text", "spark", k = 2).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Long]("id") == 1L))
  }

  // ---- held-out perplexity ----

  test("heldoutUnigramPerplexity: a one-word language has perplexity near 1") {
    val docs = (1 to 200).map(i => (i.toLong, "x x x x x")).toDF("id", "text")
    val r = LmEval.heldoutUnigramPerplexity(docs, "id", "text").collect().head
    assert(r.getAs[Long]("vocab_size") == 1L)
    assert(r.getAs[Long]("n_oov") == 0L)
    assert(r.getAs[Double]("ppl") < 1.1, s"got ${r.getAs[Double]("ppl")}")
  }

  test("heldoutUnigramPerplexity: uniform k-word language lands near k") {
    val words = ('a' to 'j').mkString(" ") // 10 uniform words per doc
    val docs = (1 to 300).map(i => (i.toLong, words)).toDF("id", "text")
    val r = LmEval.heldoutUnigramPerplexity(docs, "id", "text").collect().head
    val ppl = r.getAs[Double]("ppl")
    assert(ppl > 8.0 && ppl < 12.5, s"uniform 10-word LM must sit near 10, got $ppl")
  }

  test("heldoutUnigramPerplexity: skewed beats uniform on matching test data") {
    val skewed = (1 to 300).map(i => (i.toLong, "a a a a a a a a b c")).toDF("id", "text")
    val uniform = (1 to 300).map(i => (i.toLong + 1000, ('a' to 'j').mkString(" "))).toDF("id", "text")
    val ps = LmEval.heldoutUnigramPerplexity(skewed, "id", "text").collect().head.getAs[Double]("ppl")
    val pu = LmEval.heldoutUnigramPerplexity(uniform, "id", "text").collect().head.getAs[Double]("ppl")
    assert(ps < pu, s"concentrated distribution must have lower ppl: $ps vs $pu")
  }

  // ---- AIPW ----

  test("aipwAte: doubly robust — correct outcome model fixes a broken propensity") {
    // y = 5*t + 10*x exactly; feed a WRONG constant propensity: the
    // OLS outcome arms absorb the confound and AIPW still lands on 5
    val rows = (1 to 800).map { i =>
      val x = (i % 10).toDouble
      val t = i % 10 >= 6 // treatment correlates with x (confounded)
      (i.toLong, t, 0.5, x, 5.0 * (if (t) 1.0 else 0.0) + 10.0 * x)
    }.toDF("id", "t", "p", "x", "y")
    val r = Logistic.aipwAte(rows, "y", "t", "p", "x", clip = 0.01).collect().head
    val ate = r.getAs[Double]("ate")
    assert(math.abs(ate - 5.0) < 0.5, s"AIPW must recover +5 via the outcome model, got $ate")
    // plain IPW with the same broken propensity is badly biased
    val ipw = Logistic.ipwAte(rows, "y", "t", "p", clip = 0.01).collect().head.getAs[Double]("ate")
    assert(math.abs(ipw - 5.0) > 5.0, s"sanity: broken propensity must break IPW, got $ipw")
  }

  test("aipwAte: degenerate arm (constant x) falls back to the arm mean") {
    val rows = ((1 to 50).map(i => (i.toLong, true, 0.5, 1.0, 10.0)) ++
      (1 to 50).map(i => (i.toLong + 100, false, 0.5, 1.0, 3.0))).toDF("id", "t", "p", "x", "y")
    val r = Logistic.aipwAte(rows, "y", "t", "p", "x").collect().head
    assert(math.abs(r.getAs[Double]("ate") - 7.0) < 1e-6,
      s"constant-x arms reduce AIPW to the mean difference, got ${r.getAs[Double]("ate")}")
  }

  // ---- Markov removal attribution ----

  test("markovRemoval: hand-computed two-channel chain") {
    // userA: c1 -> conv ; userB: c1 -> drop ; userC: c2 -> conv
    // START->c1 p=2/3, START->c2 p=1/3, c1->CONV .5, c1->NULL .5, c2->CONV 1
    // pFull = 2/3*.5 + 1/3*1 = 2/3 ; remove c1 -> 1/3 ; remove c2 -> 1/3
    val ev = Seq(
      (1L, 1L, "c1"), (1L, 2L, "buy"),
      (2L, 1L, "c1"),
      (3L, 1L, "c2"), (3L, 2L, "buy")
    ).map { case (u, k, t) => (u, new java.sql.Timestamp(k * 1000), t, u * 10 + k) }
      .toDF("u", "ts", "typ", "eid")
    val out = Attribution.markovRemoval(ev, "u", "ts", "typ", "eid", "buy", iters = 8)
      .collect().map(r => r.getAs[String]("channel") -> r).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(math.abs(out("c1").getAs[Double]("p_full") - r6(2.0 / 3.0)) < 2e-6)
    assert(math.abs(out("c1").getAs[Double]("p_removed") - r6(1.0 / 3.0)) < 2e-6)
    assert(math.abs(out("c1").getAs[Double]("removal_effect") - 0.5) < 1e-4)
    assert(math.abs(out("c2").getAs[Double]("removal_effect") - 0.5) < 1e-4)
  }

  test("markovRemoval: paths truncate at the first conversion") {
    // events after the purchase must not create transitions
    val ev = Seq(
      (1L, 1L, "c1"), (1L, 2L, "buy"), (1L, 3L, "c2"), (1L, 4L, "c2")
    ).map { case (u, k, t) => (u, new java.sql.Timestamp(k * 1000), t, k) }
      .toDF("u", "ts", "typ", "eid")
    val out = Attribution.markovRemoval(ev, "u", "ts", "typ", "eid", "buy", iters = 8)
      .collect()
    assert(out.map(_.getAs[String]("channel")).toSet == Set("c1"),
      "post-conversion channels must not appear in the chain")
  }

  test("markovRemoval: sentinel-named event types are refused loudly") {
    val ev = Seq((1L, new java.sql.Timestamp(1000), "__CONV__", 1L))
      .toDF("u", "ts", "typ", "eid")
    val e = intercept[IllegalArgumentException] {
      Attribution.markovRemoval(ev, "u", "ts", "typ", "eid", "buy")
    }
    assert(e.getMessage.contains("sentinel"))
  }
}
