package graft

import graft.operators.Evaluation
import graft.pipeline.Sampling
import org.apache.spark.sql.functions._

/** Round-8 batch L: confusion matrix, Fleiss' kappa, IPF raking. */
class BatchLSpec extends SparkSpec {
  import spark.implicits._

  test("confusionMatrix: cells, recall profile, accuracy, and the (null) class") {
    val rows = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", null.asInstanceOf[String])).toDF("t", "p")
    val out = Evaluation.confusionMatrix(rows, "t", "p")
      .collect().map(r => (r.getAs[String]("true_label"), r.getAs[String]("pred_label")) -> r).toMap
    assert(out(("a", "a")).getAs[Long]("n") == 2L)
    assert(math.abs(out(("a", "a")).getAs[Double]("frac_of_true") - 2.0 / 3.0) < 1e-6)
    assert(out.contains(("b", "(null)")), "NULL predictions are a class, not a dropped row")
    assert(math.abs(out(("a", "a")).getAs[Double]("accuracy") - 0.6) < 1e-6)
  }

  test("fleissKappa: perfect agreement gives kappa 1; coin-flip raters give ~0") {
    val perfect = (1 to 60).flatMap(i =>
      Seq.fill(3)((i.toLong, if (i % 2 == 0) "x" else "y"))).toDF("item", "vote")
    val p = Evaluation.fleissKappa(perfect, "item", "vote").collect().head
    assert(math.abs(p.getAs[Double]("kappa") - 1.0) < 1e-6)
    // independent-ish raters: vote from a proper (item, rater) hash —
    // a parity formula would make raters systematically anti-agree
    val noisy = (1 to 300).flatMap(i => (1 to 3).map { r =>
      val h = scala.util.hashing.MurmurHash3.productHash((i, r))
      (i.toLong, if ((h & 1) == 0) "x" else "y")
    }).toDF("item", "vote")
    val n = Evaluation.fleissKappa(noisy, "item", "vote").collect().head
    assert(math.abs(n.getAs[Double]("kappa")) < 0.15,
      s"independent raters must sit near 0, got ${n.getAs[Double]("kappa")}")
  }

  test("fleissKappa: varying vote counts are refused loudly") {
    val bad = (Seq.fill(3)((1L, "x")) ++ Seq.fill(2)((2L, "x"))).toDF("item", "vote")
    val e = intercept[Exception] {
      Evaluation.fleissKappa(bad, "item", "vote").collect()
    }
    assert(e.getMessage.contains("same") || e.getMessage.contains("votes"))
  }

  test("fleissKappa: unanimous single category has p_e = 1 and NULL kappa") {
    val uni = (1 to 20).flatMap(i => Seq.fill(3)((i.toLong, "x"))).toDF("item", "vote")
    val r = Evaluation.fleissKappa(uni, "item", "vote").collect().head
    assert(r.getAs[Double]("p_e") == 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  test("rakeWeights: a skewed sample rakes to the population marginals") {
    // population: uniform 2x2; sample heavily over-represents (a1, b1)
    val pop = (1 to 400).map { i =>
      (if (i % 2 == 0) "a1" else "a2", if (i % 4 < 2) "b1" else "b2")
    }.toDF("ca", "cb")
    val sample = (Seq.fill(60)(("a1", "b1")) ++ Seq.fill(20)(("a1", "b2")) ++
      Seq.fill(15)(("a2", "b1")) ++ Seq.fill(5)(("a2", "b2"))).toDF("ca", "cb")
    val out = Sampling.rakeWeights(sample, pop, "ca", "cb", iters = 8).collect()
    def share(axis: String, v: String) = {
      val tot = out.map(r => r.getAs[Long]("n") * r.getAs[Double]("weight")).sum
      out.filter(_.getAs[String](axis) == v)
        .map(r => r.getAs[Long]("n") * r.getAs[Double]("weight")).sum / tot
    }
    assert(math.abs(share("a", "a1") - 0.5) < 0.01, s"lang marginal: ${share("a", "a1")}")
    assert(math.abs(share("b", "b1") - 0.5) < 0.01, s"source marginal: ${share("b", "b1")}")
  }

  test("rakeWeights: a category absent from the population gets weight 0, visibly") {
    val pop = (1 to 100).map(i => ("a1", if (i % 2 == 0) "b1" else "b2")).toDF("ca", "cb")
    val sample = (Seq.fill(10)(("a1", "b1")) :+ (("zz", "b1"))).toDF("ca", "cb")
    val out = Sampling.rakeWeights(sample, pop, "ca", "cb")
      .collect().map(r => r.getAs[String]("a") -> r.getAs[Double]("weight")).toMap
    assert(out("zz") == 0.0, "zero target mass => zero weight, not a silent renormalize")
    assert(out("a1") > 0.0)
  }
}
