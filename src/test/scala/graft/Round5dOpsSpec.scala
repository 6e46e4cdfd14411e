package graft

import graft.operators.{Benford, Ewma, Stats}
import graft.pipeline.Fusion
import graft.text.{ContentChunks, LangMix}
import org.apache.spark.sql.functions._

/** Round-5 batch: language mixture, Holt smoothing, content-defined
  * chunking, Benford audit, difference-in-differences, RRF.
  */
class Round5dOpsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  // ---------------------------------------------------------- LangMix

  test("languageMixture: dominant line language and agreement fraction") {
    val doc =
      "the cat is in the hat and that is that\n" +
        "el la de que y en los del se por\n" +
        "the dog is with the man for the win\n" +
        "   \n" // blank: not a line
    val r = LangMix.languageMixture(Seq((1L, doc)).toDF("doc_id", "text")).collect()(0)
    assert(r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[String]("main_lang") == "en")
    assert(r.getAs[Long]("n_langs") == 2L)
    assert(math.abs(r.getAs[Double]("main_frac") - 2.0 / 3.0) < 1e-9)
  }

  test("languageMixture: ties break lexicographically; und counts as a language") {
    val doc = "el la de que y en los del se por\nthe cat is in the hat for now ok\nzzz qqq xxx"
    val r = LangMix.languageMixture(Seq((1L, doc)).toDF("doc_id", "text")).collect()(0)
    // one es line, one en line, one und line -> tie at 1, 'en' < 'es' < 'und'
    assert(r.getAs[Long]("n_langs") == 3L)
    assert(r.getAs[String]("main_lang") == "en")
  }

  // ------------------------------------------------------------- Holt

  test("holtLast: matches a hand fold of the level/trend recurrence") {
    val ts = (i: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:00:0$i")
    val xs = Seq(10.0, 12.0, 15.0, 13.0)
    val ev = xs.zipWithIndex.map { case (v, i) => (1L, ts(i), i.toLong, v) }
      .toDF("user_id", "ts", "event_id", "value")
    val (alpha, beta) = (0.5, 0.3)
    var (l, t) = (xs.head, 0.0)
    xs.tail.foreach { x =>
      val l2 = alpha * x + (1.0 - alpha) * (l + t)
      t = beta * (l2 - l) + (1.0 - beta) * t
      l = l2
    }
    val r = Ewma.holtLast(ev, "user_id", "ts", "value", "event_id", alpha, beta).collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("level") - l) < 1e-12)
    assert(math.abs(r.getAs[Double]("trend") - t) < 1e-12)
    assert(math.abs(r.getAs[Double]("forecast") - (l + t)) < 1e-12)
  }

  test("holtLast: single observation seeds (x0, 0)") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 7.5))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Ewma.holtLast(ev, "user_id", "ts", "value", "event_id", 0.5, 0.3).collect()(0)
    assert(r.getAs[Double]("level") == 7.5 && r.getAs[Double]("trend") == 0.0)
  }

  test("holtLast tracks a linear ramp where ewma lags it") {
    val ts = (i: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d")
    val ev = (0 until 40).map(i => (1L, ts(i), i.toLong, 10.0 + 2.0 * i))
      .toDF("user_id", "ts", "event_id", "value")
    val holt = Ewma.holtLast(ev, "user_id", "ts", "value", "event_id", 0.5, 0.3)
      .collect()(0).getAs[Double]("forecast")
    val ewma = Ewma.ewmaLast(ev, "user_id", "ts", "value", "event_id", 0.5)
      .collect()(0).getAs[Double]("ewma")
    val next = 10.0 + 2.0 * 40 // true next value of the ramp
    assert(math.abs(holt - next) < math.abs(ewma - next),
      s"holt $holt should beat ewma $ewma at predicting $next")
  }

  // ----------------------------------------------- content-defined chunks

  test("chunkTable: chunks tile the token stream and re-align after an insertion") {
    // 7 is coprime with 26, so the 60 words cycle through 26 distinct types
    val base = (1 to 60).map(i => ('a' + (i * 7) % 26).toChar.toString * 3).mkString(" ")
    val edited = "zzz www " + base // prepend 2 tokens
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val t = ContentChunks.chunkTable(df, k = 3, divisor = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("chunk_idx"), r.getAs[Long]("chunk_hash")))
    val byDoc = t.groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._3).toSet }
    // content-defined cuts mean the shifted copy still shares most chunks
    val shared = (byDoc(1L) intersect byDoc(2L)).size
    assert(shared >= byDoc(1L).size / 2,
      s"only $shared of ${byDoc(1L).size} chunks re-aligned after a 2-token insert")
  }

  test("chunkDupStats: boilerplate block shared by many docs is flagged; unique docs are clean") {
    val boiler = (1 to 30).map(i => ('a' + (i * 7) % 26).toChar.toString * 2).mkString(" ")
    def unique(seed: Int) = (1 to 30).map(i => ('a' + (i * seed + 11) % 26).toChar.toString * 4).mkString(" ")
    val df = Seq(
      (1L, s"$boiler ${unique(3)}"),
      (2L, s"$boiler ${unique(5)}"),
      (3L, unique(17))).toDF("doc_id", "text")
    val out = ContentChunks.chunkDupStats(df, k = 3, divisor = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("dup_frac")).toMap
    assert(out(1L) > 0.0 && out(2L) > 0.0, s"shared boilerplate chunks must flag: $out")
    assert(out(3L) == 0.0, s"unique doc must have zero cross-doc chunks: $out")
  }

  test("chunkTable: short and empty docs degrade to one / zero chunks") {
    val df = Seq((1L, "just two"), (2L, ""), (3L, "one two three four")).toDF("doc_id", "text")
    val n = ContentChunks.chunkTable(df, k = 5, divisor = 8)
      .groupBy("id").count().collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("count")).toMap
    assert(n.getOrElse(1L, 0L) == 1L, "below-k doc is one whole-doc chunk")
    assert(!n.contains(2L), "empty doc has no chunks")
    assert(n(3L) == 1L)
  }

  // ---------------------------------------------------------- Benford

  test("firstDigitAudit: a Benford-distributed sample scores far below a uniform one") {
    // geometric magnitudes -> Benford-ish; constant-leading-digit -> not
    val benford = (1 to 500).map(i => ("b", math.pow(1.02, i)))
    val flat = (1 to 500).map(i => ("f", 500.0 + i % 400)) // leading digits 5-8 only
    val df = (benford ++ flat).toDF("g", "value")
    val out = Benford.firstDigitAudit(df, Seq("g"), "value")
      .select("g", "chi2").distinct()
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("chi2")).toMap
    assert(out("b") < out("f") / 5, s"benford ${out("b")} should be far below flat ${out("f")}")
  }

  test("firstDigitAudit: all 9 digits present per group with exact counts") {
    val df = Seq(("g", 1.5), ("g", 19.0), ("g", 950.0), ("g", 0.5)).toDF("g", "value")
    val rows = Benford.firstDigitAudit(df, Seq("g"), "value").collect()
    assert(rows.length == 9)
    val n = rows.map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n")).toMap
    assert(n(1) == 2L && n(9) == 1L && n(2) == 0L) // 0.5 excluded (< 1)
    val fr = rows.map(r => r.getAs[Double]("obs_frac")).sum
    assert(math.abs(fr - 1.0) < 1e-9)
  }

  // -------------------------------------------------------------- DiD

  test("didTest: recovers a pure treatment effect net of arm and time offsets") {
    // arm A: 10 pre, 12 post (time trend +2); arm B: 20 pre, 25 post
    // (trend +2 plus effect +3); small jitter to give variance
    val rows = (0 until 40).flatMap { i =>
      val j = (i % 4) * 0.01
      Seq(("m", false, false, 10.0 + j), ("m", false, true, 12.0 + j),
        ("m", true, false, 20.0 + j), ("m", true, true, 25.0 + j))
    }
    val df = rows.toDF("g", "b", "p", "value")
    val r = Stats.didTest(df, Seq("g"), "value", col("b"), col("p")).collect()(0)
    assert(r.getAs[Long]("n_a_pre") == 40L && r.getAs[Long]("n_b_post") == 40L)
    assert(math.abs(r.getAs[Double]("did") - 3.0) < 1e-9)
    assert(r.getAs[Double]("z") > 100, "tiny jitter -> huge z on a clean +3 effect")
  }

  test("didTest: any cell below n=2 nulls se and z") {
    val df = Seq(("g", false, false, 1.0), ("g", false, true, 2.0), ("g", false, true, 2.5),
      ("g", true, false, 3.0), ("g", true, false, 3.5), ("g", true, true, 4.0))
      .toDF("g", "b", "p", "value")
    val r = Stats.didTest(df, Seq("g"), "value", col("b"), col("p")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("se")) && r.isNullAt(r.fieldIndex("z")))
  }

  // -------------------------------------------------------------- RRF

  test("reciprocalRankFusion: agreement beats a single #1") {
    val a = Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L)).toDF("query_id", "doc_id", "rank")
    val b = Seq(("q", 2L, 1L), ("q", 3L, 2L), ("q", 9L, 3L)).toDF("query_id", "doc_id", "rank")
    val out = Fusion.reciprocalRankFusion(Seq(a, b), k = 60, topK = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"))).toMap
    // doc 2: ranks (2,1) -> 1/62+1/61; doc 1: only (1) -> 1/61; doc 2 wins
    assert(out(2L) == 1L, s"doc 2 (both lists) must fuse first: $out")
    assert(Set(1L, 3L).contains(out.filter(_._2 == 2L).keys.head))
    // absent-from-one-list docs still rank (RRF convention)
    assert(out.contains(9L))
  }

  test("reciprocalRankFusion: deterministic doc-id tiebreak and topK cut") {
    val a = (1L to 30L).map(d => ("q", d, d)).toDF("query_id", "doc_id", "rank")
    val out = Fusion.reciprocalRankFusion(Seq(a), topK = 5).collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Long]("doc_id")).sorted.sameElements(Array(1L, 2L, 3L, 4L, 5L)))
  }
}
