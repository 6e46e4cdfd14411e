package graft

import graft.operators.{Logistic, Survival, Transitions}
import graft.pipeline.Labels
import graft.text.WordVocab
import org.apache.spark.sql.functions._

/** Round-8 batch K: RMST contrast, entropy rate, Heaps' law, label
  * engineering, HTE by propensity bin.
  */
class BatchKSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String)]) =
    rows.map { case (u, day, t) =>
      (u, new java.sql.Timestamp(day * 86400000L), t, u * 100 + day)
    }.toDF("u", "ts", "typ", "eid")

  test("rmstDiff: the faster-converting arm has lower RMST") {
    // arm A (u odd): converts day 1; arm B: converts day 8
    val rows = (1L to 40L).flatMap(u =>
      Seq((u, 0L, "x"), (u, if (u % 2 == 1) 1L else 8L, "buy")))
    val r = Survival.rmstDiff(ev(rows), "u", "ts", "typ", "buy",
      col("u") % 2 === 1, horizonDays = 10L).collect().head
    assert(r.getAs[Long]("n_a") == 20L && r.getAs[Long]("n_b") == 20L)
    assert(math.abs(r.getAs[Double]("rmst_a") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("rmst_b") - 8.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("rmst_diff") + 7.0) < 1e-6)
  }

  test("rmstDiff: an empty arm yields NULL rmst and diff") {
    val rows = (1L to 5L).flatMap(u => Seq((u, 0L, "x"), (u, 2L, "buy")))
    val r = Survival.rmstDiff(ev(rows), "u", "ts", "typ", "buy",
      lit(false), horizonDays = 10L).collect().head
    assert(r.getAs[Long]("n_a") == 0L)
    assert(r.isNullAt(r.fieldIndex("rmst_a")) && r.isNullAt(r.fieldIndex("rmst_diff")))
    assert(math.abs(r.getAs[Double]("rmst_b") - 2.0) < 1e-6)
  }

  test("entropyRate: a deterministic cycle scores ~0; uniform chain scores ~ln k") {
    // cycle a->b->a->b...: every next step is certain
    val cyc = (1L to 200L).map(i => (1L, i, if (i % 2 == 0) "a" else "b"))
    val rc = Transitions.entropyRate(ev(cyc), "u", "ts", "typ", "eid").collect().head
    assert(rc.getAs[Double]("entropy_rate") < 1e-9)
    assert(rc.getAs[Double]("predictability") > 0.999)
    // 2-state uniform: from each state both successors equally likely
    val uni = (1L to 400L).map(i => (1L, i, Seq("a", "a", "b", "b")((i % 4).toInt)))
    val ru = Transitions.entropyRate(ev(uni), "u", "ts", "typ", "eid").collect().head
    assert(ru.getAs[Double]("entropy_rate") > 0.6, s"got ${ru.getAs[Double]("entropy_rate")}")
  }

  test("heapsLaw: sublinear vocabulary growth fits beta in (0,1); closed vocab fits ~0") {
    // growing vocab: doc i introduces ~sqrt-new words. Word ids are
    // encoded in LETTERS — the tokenizer splits on non-letters, so
    // "w123" would collapse the whole vocabulary to "w"
    def alpha(k: Int): String = k.toString.map(c => ('a' + (c - '0')).toChar)
    val grow = (1 to 512).map { i =>
      val m = 30 * math.sqrt(i.toDouble).toInt.max(1)
      val words = (0 until 20).map(j => s"w${alpha((i * 20 + j) % m)}")
      (i.toLong, words.mkString(" "))
    }.toDF("id", "text")
    val g = WordVocab.heapsLaw(grow, "id", "text", Seq(16L, 32L, 64L, 128L, 256L, 512L))
      .collect().head
    val beta = g.getAs[Double]("heaps_beta")
    assert(beta > 0.1 && beta < 1.0, s"growing vocab must fit 0<beta<1, got $beta")
    assert(g.getAs[Double]("r2") > 0.8)
    val closed = (1 to 512).map(i => (i.toLong, "a b c d e f g h")).toDF("id", "text")
    val c = WordVocab.heapsLaw(closed, "id", "text", Seq(16L, 32L, 64L, 128L, 256L, 512L))
      .collect().head
    assert(math.abs(c.getAs[Double]("heaps_beta")) < 0.01, "closed vocab => flat growth")
  }

  test("activityLabels: windows cannot leak — horizon events never count as features") {
    val day = 86400000000L
    val cutoff = 20L * day
    val rows = Seq(
      (1L, 15L, "click"), (1L, 22L, "buy"), // active obs, converts in horizon
      (2L, 12L, "click"), (2L, 18L, "click"), // active obs, silent horizon
      (3L, 21L, "buy"), // horizon-only: must have NO row
      (4L, 2L, "click")) // pre-obs only: no row
    val out = Labels.activityLabels(ev(rows), "u", "ts", "typ", "buy",
      cutoffUs = cutoff, obsDays = 10, horizonDays = 5)
      .collect().map(r => r.getAs[Long]("u") -> r).toMap
    assert(out.keySet == Set(1L, 2L), s"got ${out.keySet}")
    assert(out(1L).getAs[Boolean]("label_target"))
    assert(!out(2L).getAs[Boolean]("label_active"))
    assert(out(1L).getAs[Long]("n_obs_events") == 1L,
      "the horizon buy must NOT count as an observed event")
    assert(math.abs(out(2L).getAs[Double]("recency_hours") - 48.0) < 1e-6)
  }

  test("hteByPropensityBin: effect heterogeneity shows up in the right bins") {
    // low-p bin: effect +10; high-p bin: effect 0
    val rows = (1 to 400).map { i =>
      val hi = i % 2 == 0
      val p = if (hi) 0.85 else 0.15
      val t = i % 4 < 2 // both arms present in both bins
      val y = (if (hi) 50.0 else 20.0) + (if (t && !hi) 10.0 else 0.0)
      (i.toLong, t, p, y)
    }.toDF("id", "t", "p", "y")
    val out = Logistic.hteByPropensityBin(rows, "y", "t", "p", nBins = 10)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(math.abs(out(1L).getAs[Double]("diff") - 10.0) < 1e-6)
    assert(math.abs(out(8L).getAs[Double]("diff")) < 1e-6)
    assert(out.keySet == Set(1L, 8L))
  }
}
