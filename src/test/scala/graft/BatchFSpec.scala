package graft

import graft.ann.Embeddings
import graft.operators.{Hypothesis, Jackknife, Stump}
import graft.text.WordVocab
import org.apache.spark.sql.functions._

/** Round-8 batch F: CMH, decision stump, jackknife, Mahalanobis,
  * negative-sampling table.
  */
class BatchFSpec extends SparkSpec {
  import spark.implicits._

  // ---- Cochran-Mantel-Haenszel ----

  test("cmh: Simpson's-paradox fixture — pooled table lies, CMH does not") {
    // stratum s1: arm A 80 rows at 50% hit, arm B 20 rows at 50%
    // stratum s2: arm A 20 rows at 10% hit, arm B 80 rows at 10%
    // within each stratum the arms are IDENTICAL (OR = 1), but pooled,
    // arm A skews toward the high-rate stratum
    def rows(st: String, a: Boolean, n: Int, hits: Int) =
      (1 to n).map(i => (st, a, i <= hits))
    val df = (rows("s1", true, 80, 40) ++ rows("s1", false, 20, 10) ++
      rows("s2", true, 20, 2) ++ rows("s2", false, 80, 8))
      .toDF("st", "a", "hit")
    val r = Hypothesis.cmh(df, Seq("st"), col("hit"), col("a")).collect().head
    assert(r.getAs[Double]("or_mh") == 1.0, "stratified OR must be exactly 1")
    assert(r.getAs[Double]("chi2") < 0.01, s"no stratified effect, got chi2=${r.getAs[Double]("chi2")}")
    // sanity: the naive pooled 2x2 is badly confounded (A: 42%, B: 18%)
    val pooledA = 42.0 / 100.0; val pooledB = 18.0 / 100.0
    assert(pooledA / pooledB > 2.0)
  }

  test("cmh: a real stratified effect is detected") {
    def rows(st: String, a: Boolean, n: Int, hits: Int) =
      (1 to n).map(i => (st, a, i <= hits))
    val df = (rows("s1", true, 50, 40) ++ rows("s1", false, 50, 20) ++
      rows("s2", true, 50, 25) ++ rows("s2", false, 50, 10))
      .toDF("st", "a", "hit")
    val r = Hypothesis.cmh(df, Seq("st"), col("hit"), col("a")).collect().head
    assert(r.getAs[Double]("or_mh") > 2.0)
    assert(r.getAs[Double]("chi2") > 10.0)
    assert(r.getAs[Double]("p_value") < 0.01)
  }

  test("cmh: single-row strata are dropped and counted") {
    val df = (Seq(("s1", true, true)) ++
      (1 to 40).map(i => ("s2", i % 2 == 0, i % 4 == 0))).toDF("st", "a", "hit")
    val r = Hypothesis.cmh(df, Seq("st"), col("hit"), col("a")).collect().head
    assert(r.getAs[Long]("k_dropped") == 1L)
    assert(r.getAs[Long]("k_strata") == 1L)
    assert(r.getAs[Long]("n") == 40L, "dropped stratum must not count toward n")
  }

  // ---- decision stump ----

  test("bestSplits: recovers a planted threshold and ranks the noise feature below") {
    // y = x > 50 exactly; noise feature carries nothing
    val df = (1 to 200).map { i =>
      (i > 100, i.toDouble / 2.0, (i % 7).toDouble)
    }.toDF("y", "signal", "noise")
    val out = Stump.bestSplits(df, col("y"),
      Seq("signal" -> col("signal"), "noise" -> col("noise")), bins = 16)
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    val sig = out("signal")
    assert(math.abs(sig.getAs[Double]("threshold") - 50.5) < 4.0,
      s"split must land near 50, got ${sig.getAs[Double]("threshold")}")
    assert(sig.getAs[Double]("gain") > 0.4)
    assert(out("noise").getAs[Double]("gain") < 0.05)
    assert(sig.getAs[Long]("n_left") + sig.getAs[Long]("n_right") == 200L)
  }

  test("bestSplits: constant features are absent, not fake 0-gain rows") {
    val df = (1 to 50).map(i => (i % 2 == 0, i.toDouble, 3.0)).toDF("y", "x", "const")
    val feats = Stump.bestSplits(df, col("y"), Seq("x" -> col("x"), "const" -> col("const")))
      .select("feature").as[String].collect().toSet
    assert(feats == Set("x"))
  }

  // ---- jackknife ratio CI ----

  test("ratioCi: homogeneous buckets give a tight interval around the true ratio") {
    // every row contributes num=2, den=1 -> ratio exactly 2, se ~ 0
    val df = (1 to 1000).map(i => (i.toLong, 2.0, 1.0)).toDF("id", "num", "den")
    val r = Jackknife.ratioCi(df, "id", col("num"), col("den"), buckets = 10).collect().head
    assert(r.getAs[Double]("ratio") == 2.0)
    assert(r.getAs[Double]("se_jack") < 1e-9)
    assert(r.getAs[Long]("b_degenerate") == 0L)
  }

  test("ratioCi: heterogeneous buckets widen the interval") {
    val df = (1 to 1000).map(i => (i.toLong, (i % 10).toDouble, 1.0)).toDF("id", "num", "den")
    val r = Jackknife.ratioCi(df, "id", col("num"), col("den"), buckets = 10).collect().head
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < r.getAs[Double]("ratio") && r.getAs[Double]("ratio") < hi)
    assert(r.getAs[Double]("se_jack") > 0)
  }

  test("ratioCi: a bucket that owns the whole denominator is degenerate -> NULL se") {
    // only a single id carries den>0: removing its bucket zeroes D
    val df = ((1 to 99).map(i => (i.toLong, 1.0, 0.0)) :+ (100L, 1.0, 5.0))
      .toDF("id", "num", "den")
    val r = Jackknife.ratioCi(df, "id", col("num"), col("den"), buckets = 5).collect().head
    assert(r.getAs[Long]("b_degenerate") >= 1L)
    assert(r.isNullAt(r.fieldIndex("se_jack")) && r.isNullAt(r.fieldIndex("ci_lo")))
    assert(r.getAs[Double]("ratio") > 0, "the point estimate itself is still reportable")
  }

  // ---- diagonal Mahalanobis ----

  test("mahalanobisDiag: a planted outlier dominates; zero-variance dims are excluded") {
    // dim0 varies, dim1 constant, dim2 varies; vec 99 is 100 sigma out on dim0
    val vecs = (1 to 99).map(i =>
      (i.toLong, Seq((i % 10).toFloat, 5.0f, (i % 3).toFloat))) :+
      (100L, Seq(1000.0f, 5.0f, 1.0f))
    val out = Embeddings.mahalanobisDiag(vecs.toDF("vec_id", "embedding"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(out.values.head.getAs[Long]("n_dims_used") == 2L, "constant dim must be excluded")
    val top = out.maxBy(_._2.getAs[Double]("maha"))
    assert(top._1 == 100L, s"outlier must rank first, got ${top._1}")
    assert(top._2.getAs[Double]("maha") > 5 * out(1L).getAs[Double]("maha"))
  }

  test("mahalanobisDiag: m2 is the sum of r6-pinned per-dim z-squares") {
    val vecs = Seq((1L, Seq(0.0f, 10.0f)), (2L, Seq(2.0f, 20.0f)), (3L, Seq(4.0f, 30.0f)))
    val out = Embeddings.mahalanobisDiag(vecs.toDF("vec_id", "embedding"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("m2")).toMap
    // dim0: mean 2 var 4 ; dim1: mean 20 var 100 — vec1 z2 = 1 + 1
    assert(math.abs(out(1L) - 2.0) < 1e-6, s"got ${out(1L)}")
    assert(math.abs(out(2L) - 0.0) < 1e-6)
    assert(math.abs(out(3L) - 2.0) < 1e-6)
  }

  // ---- negative-sampling table ----

  test("samplingTable: probabilities sum to ~1 and ranges tile [0, max) contiguously") {
    val docs = Seq((1L, "a a a a a a a a b b b c")).toDF("id", "text")
    val rows = WordVocab.samplingTable(docs, "text")
      .orderBy(col("cum_lo")).collect()
    assert(rows.map(_.getAs[String]("word")).toSeq == Seq("a", "b", "c"))
    val total = rows.map(_.getAs[Double]("prob")).sum
    assert(math.abs(total - 1.0) < 1e-4)
    rows.sliding(2).foreach { case Array(x, y) =>
      assert(x.getAs[Double]("cum_hi") == y.getAs[Double]("cum_lo"), "ranges must tile")
    case _ => ()
    }
    // 0.75-power compression: a has 8x the count of c but < 8x the prob
    val pa = rows.head.getAs[Double]("prob"); val pc = rows.last.getAs[Double]("prob")
    assert(pa / pc < 8.0 && pa / pc > 3.0, s"power smoothing must compress, got ${pa / pc}")
  }
}
