package graft

import graft.ann.Embeddings
import graft.operators.{Hypothesis, Survival}
import graft.pipeline.Influence
import org.apache.spark.sql.functions._

/** Round-8 batch J: competing risks, LOO influence, isotropy, Simpson
  * audit, E-value.
  */
class BatchJSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String)]) =
    rows.map { case (u, day, t) =>
      (u, new java.sql.Timestamp(day * 86400000L), t)
    }.toDF("u", "ts", "typ")

  // ---- competing risks ----

  test("competingRisks: CIFs partition the exit mass; identity CIF1+CIF2+S = 1") {
    // 4 subjects: day1 cause A, day2 cause B, day3 cause A, censored day5
    val df = ev(Seq(
      (1L, 0L, "x"), (1L, 1L, "a"),
      (2L, 0L, "x"), (2L, 2L, "b"),
      (3L, 0L, "x"), (3L, 3L, "a"),
      (4L, 0L, "x"), (4L, 5L, "x")))
    val out = Survival.competingRisks(df, "u", "ts", "typ", "a", "b")
      .orderBy("t_day").collect()
    // hand: day1 S-=1, d1=1/4 -> cif1 .25 ; day2 S-=.75, d2=1/3 -> cif2 .25
    // day3 S-=.5, d1=1/2 -> cif1 .25+.25=.5
    val last = out.last
    assert(math.abs(out(0).getAs[Double]("cif1") - 0.25) < 1e-4)
    assert(math.abs(out(1).getAs[Double]("cif2") - 0.25) < 1e-4)
    assert(math.abs(last.getAs[Double]("cif1") - 0.5) < 1e-4)
    assert(math.abs(last.getAs[Double]("cif2") - 0.25) < 1e-4)
    // remaining survival at the end: 1 - .5 - .25 = .25 (one censored)
    assert(last.getAs[Double]("cif1") + last.getAs[Double]("cif2") <= 1.0 + 1e-9)
  }

  test("competingRisks: a tie between causes goes to cause 1, deterministically") {
    val df = Seq((1L, new java.sql.Timestamp(0L), "a"),
      (1L, new java.sql.Timestamp(0L), "b")).toDF("u", "ts", "typ")
    val out = Survival.competingRisks(df, "u", "ts", "typ", "a", "b").collect().head
    assert(out.getAs[Long]("d_cause1") == 1L && out.getAs[Long]("d_cause2") == 0L)
  }

  test("competingRisks: 1-KM per cause would overcount; CIF does not") {
    // heavy competing cause: 90 subjects exit via b on day1, 10 via a day2
    val rows = (1L to 90L).flatMap(u => Seq((u, 0L, "x"), (u, 1L, "b"))) ++
      (91L to 100L).flatMap(u => Seq((u, 0L, "x"), (u, 2L, "a")))
    val out = Survival.competingRisks(ev(rows), "u", "ts", "typ", "a", "b")
      .orderBy("t_day").collect()
    val cif1 = out.last.getAs[Double]("cif1")
    // true incidence of cause a is 10%: CIF must say .1, not the ~100%
    // a cause-a KM (censoring b) would claim
    assert(math.abs(cif1 - 0.1) < 1e-4, s"got $cif1")
  }

  // ---- LOO influence ----

  test("leaveOneOutMean: removing the low group raises the corpus mean") {
    val rows = ((1 to 50).map(i => ("low", 1.0)) ++ (1 to 50).map(i => ("high", 9.0)))
      .toDF("g", "v")
    val out = Influence.leaveOneOutMean(rows, "g", col("v"))
      .collect().map(r => r.getAs[String]("group") -> r).toMap
    assert(out("low").getAs[Double]("delta") > 3.9, "drop the drag => corpus improves")
    assert(out("high").getAs[Double]("delta") < -3.9)
    assert(math.abs(out("low").getAs[Double]("loo_mean") - 9.0) < 1e-6)
  }

  test("leaveOneOutMean: a group that is the whole corpus has NULL loo") {
    val rows = (1 to 10).map(i => ("only", i.toDouble)).toDF("g", "v")
    val r = Influence.leaveOneOutMean(rows, "g", col("v")).collect().head
    assert(r.isNullAt(r.fieldIndex("loo_mean")) && r.isNullAt(r.fieldIndex("delta")))
  }

  // ---- isotropy ----

  test("isotropy: identical directions give mean cosine ~1; balanced opposites ~ -1/(n-1)") {
    val same = (1 to 40).map(i => (i.toLong, Seq(3.0f * i, 4.0f * i))) // all same direction
    val s = Embeddings.isotropy(same.toDF("vec_id", "embedding")).collect().head
    assert(s.getAs[Double]("mean_offdiag_cos") > 0.999, s"got ${s.getAs[Double]("mean_offdiag_cos")}")
    val opp = (1 to 20).map(i =>
      (i.toLong, if (i % 2 == 0) Seq(1.0f, 0.0f) else Seq(-1.0f, 0.0f)))
    val o = Embeddings.isotropy(opp.toDF("vec_id", "embedding")).collect().head
    // 10 vs 10 opposite: sum = 0 -> mean offdiag = -n/(n(n-1)) = -1/19
    assert(math.abs(o.getAs[Double]("mean_offdiag_cos") + 1.0 / 19.0) < 1e-4)
    assert(o.getAs[Double]("centroid_norm") < 1e-6)
  }

  test("isotropy: zero vectors are dropped and counted") {
    val rows = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)))
    val r = Embeddings.isotropy(rows.toDF("vec_id", "embedding")).collect().head
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("n_zero") == 1L)
    assert(math.abs(r.getAs[Double]("mean_offdiag_cos")) < 1e-9, "orthogonal pair => 0")
  }

  // ---- Simpson audit + E-value ----

  test("simpsonCheck: the classic reversal fires the flag") {
    // stratum s1: A 10/80 vs B 5/20 (A worse: .125 vs .25)
    // stratum s2: A 16/20 vs B 60/80 (A worse: .8 vs .75... adjust)
    // build a true reversal: within both strata B beats A, pooled A wins
    def mk(st: String, a: Boolean, n: Int, k: Int) =
      (1 to n).map(i => (st, a, i <= k))
    val df = (mk("s1", true, 80, 32) ++ mk("s1", false, 20, 10) ++ // .4 vs .5
      mk("s2", true, 20, 2) ++ mk("s2", false, 80, 12)) // .1 vs .15
      .toDF("st", "a", "hit")
    val r = Hypothesis.simpsonCheck(df, Seq("st"), col("hit"), col("a")).collect().head
    assert(r.getAs[Double]("pooled_diff") > 0, "pooled: A looks better")
    assert(r.getAs[Double]("stratified_diff") < 0, "stratified: A is worse everywhere")
    assert(r.getAs[Boolean]("simpson_flag"))
    assert(r.getAs[Long]("n_reversed") == 2L)
  }

  test("simpsonCheck: consistent strata do not flag") {
    def mk(st: String, a: Boolean, n: Int, k: Int) =
      (1 to n).map(i => (st, a, i <= k))
    val df = (mk("s1", true, 50, 30) ++ mk("s1", false, 50, 20) ++
      mk("s2", true, 50, 40) ++ mk("s2", false, 50, 25)).toDF("st", "a", "hit")
    val r = Hypothesis.simpsonCheck(df, Seq("st"), col("hit"), col("a")).collect().head
    assert(!r.getAs[Boolean]("simpson_flag"))
    assert(r.getAs[Long]("n_reversed") == 0L)
  }

  test("eValue: hand-computed bound; protective ratios invert first") {
    // pa=.4, pb=.1 -> RR=4 -> E = 4 + sqrt(12) = 7.4641
    val df = ((1 to 100).map(i => (true, i <= 40)) ++ (1 to 100).map(i => (false, i <= 10)))
      .toDF("a", "hit")
    val r = Hypothesis.eValue(df, col("hit"), col("a")).collect().head
    assert(math.abs(r.getAs[Double]("e_value") - (4.0 + math.sqrt(12.0))) < 1e-4)
    // swap arms: RR = .25 -> same E after inversion
    val r2 = Hypothesis.eValue(df, col("hit"), !col("a")).collect().head
    assert(math.abs(r2.getAs[Double]("e_value") - r.getAs[Double]("e_value")) < 1e-4)
  }
}
