package graft

import graft.operators.Evaluation
import org.apache.spark.sql.functions._

/** PAVA isotonic recalibration over binned reliability tables. */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(Double, Boolean)], nBins: Int = 4) =
    Evaluation.isotonicCalibration(
        rows.toDF("s", "y"), Seq.empty, "s", col("y"), nBins)
      .orderBy("bin").collect()

  test("already-monotone bins pass through unchanged") {
    val rows = Seq((0.1, false), (0.1, false), (0.3, true), (0.3, false),
      (0.6, true), (0.6, false), (0.9, true), (0.9, true))
    val out = fit(rows)
    assert(out.map(_.getAs[Double]("acc")).toSeq == Seq(0.0, 0.5, 0.5, 1.0))
    assert(out.map(_.getAs[Double]("iso")).toSeq == Seq(0.0, 0.5, 0.5, 1.0))
  }

  test("a violating pair pools to its weighted mean") {
    // bin0: 1 positive (acc 1), bin1: 1 negative (acc 0) -> both 0.5
    val out = fit(Seq((0.1, true), (0.3, false)))
    assert(out.map(_.getAs[Double]("iso")).toSeq == Seq(0.5, 0.5))
    // weighted: bin0 has 3 positives, bin1 one negative -> pooled 0.75
    val w = fit(Seq((0.1, true), (0.1, true), (0.1, true), (0.3, false)))
    assert(w.map(_.getAs[Double]("iso")).toSeq == Seq(0.75, 0.75))
  }

  test("textbook PAVA sequence and global monotonicity") {
    // bins accs: 0.2, 0.6, 0.4, 0.8 -> middle pair pools to 0.5
    val rows =
      (1 to 5).map(i => (0.1, i <= 1)) ++ (1 to 5).map(i => (0.3, i <= 3)) ++
      (1 to 5).map(i => (0.6, i <= 2)) ++ (1 to 5).map(i => (0.9, i <= 4))
    val out = fit(rows)
    assert(out.map(_.getAs[Double]("iso")).toSeq == Seq(0.2, 0.5, 0.5, 0.8))
    val iso = out.map(_.getAs[Double]("iso"))
    assert(iso.sliding(2).forall(p => p(0) <= p(1)), "monotone non-decreasing")
    // conf is the mean raw score per bin
    assert(math.abs(out.head.getAs[Double]("conf") - 0.1) < 1e-6)
  }

  test("grouped fits are independent; empty bins are absent not zero") {
    val rows = Seq(("a", 0.1, true), ("a", 0.9, false),
      ("b", 0.1, false), ("b", 0.9, true)).toDF("g", "s", "y")
    val out = Evaluation.isotonicCalibration(rows, Seq("g"), "s", col("y"), 4)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("bin")) -> r).toMap
    assert(out.size == 4, "two non-empty bins per group")
    // a: violation pools to 0.5/0.5; b: monotone 0 -> 1 stays
    assert(out(("a", 0L)).getAs[Double]("iso") == 0.5)
    assert(out(("a", 3L)).getAs[Double]("iso") == 0.5)
    assert(out(("b", 0L)).getAs[Double]("iso") == 0.0)
    assert(out(("b", 3L)).getAs[Double]("iso") == 1.0)
  }

  // ------------------------------------------------------------- prCurve

  test("prCurve: hand-computed cutoffs, monotone recall, degenerate guard") {
    // bins (4): scores .1(2 rows,1 pos) .3(2,2) .6(2,0) .9(2,2): tot=5
    val rows = Seq(
      (0.1, true), (0.1, false), (0.3, true), (0.3, true),
      (0.6, false), (0.6, false), (0.9, true), (0.9, true))
    val out = Evaluation.prCurve(rows.toDF("s", "y"), Seq.empty, "s", col("y"), 4)
      .orderBy(org.apache.spark.sql.functions.col("cutoff").desc).collect()
    // cutoff .75: tp=2 n=2 -> p=1, r=2/5
    assert(out(0).getAs[Double]("cutoff") == 0.75)
    assert(out(0).getAs[Long]("tp") == 2L && out(0).getAs[Long]("fp") == 0L)
    assert(math.abs(out(0).getAs[Double]("recall") - 0.4) < 1e-9)
    // cutoff .5: tp=2 n=4; cutoff .25: tp=4 n=6; cutoff 0: tp=5 n=8
    assert(out(1).getAs[Long]("tp") == 2L && out(1).getAs[Long]("fp") == 2L)
    assert(out(2).getAs[Long]("tp") == 4L && out(3).getAs[Long]("tp") == 5L)
    // recall monotone non-decreasing as the cutoff drops
    val recalls = out.map(_.getAs[Double]("recall"))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)))
    // f1 at cutoff 0: p=5/8, r=1 -> 2*(5/8)/(5/8+1)
    val p0 = 5.0 / 8.0
    assert(math.abs(out(3).getAs[Double]("f1") - 2.0 * p0 / (p0 + 1.0)) < 1e-9)
    // no positives at all: recall/f1 NULL, precision 0
    val neg = Seq((0.2, false), (0.8, false)).toDF("s", "y")
    val rn = Evaluation.prCurve(neg, Seq.empty, "s", col("y"), 4).collect()
    rn.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("recall")) && r.isNullAt(r.fieldIndex("f1")))
      assert(r.getAs[Double]("precision") == 0.0)
    }
  }
}
