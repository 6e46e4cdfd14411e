package graft

import graft.ann.Srp
import graft.operators.{Evaluation, Reliability}
import org.apache.spark.sql.functions._

/** Round-8 batch M: capture-recapture, split-half reliability,
  * cost-optimal threshold.
  */
class BatchMSpec extends SparkSpec {
  import spark.implicits._

  test("captureRecapture: seeded passes differ; the estimate bounds both catches") {
    // clusters of near-identical vectors so LSH has something to catch
    val vecs = (0 until 60).map { i =>
      val base = Array.tabulate(64)(d => math.sin((i / 3 + 1) * (d + 1) * 0.1).toFloat)
      base(i % 64) = base(i % 64) + 0.01f * (i % 3)
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val r = Srp.captureRecapture(vecs, threshold = 0.9, seedA = "s1", seedB = "s2")
      .collect().head
    val (na, nb, m) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"))
    assert(na > 0 && nb > 0, s"both passes must catch pairs: $na $nb")
    assert(m <= math.min(na, nb))
    val est = r.getAs[Double]("n_est")
    assert(est >= math.max(na, nb) - 1e-6, "the population can't be smaller than a catch")
    assert(r.getAs[Double]("recall_a") <= 1.0 + 1e-9)
  }

  test("captureRecapture: identical seeds are refused") {
    val vecs = Seq((1L, Seq.fill(64)(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Srp.captureRecapture(vecs, 0.5, "same", "same")
    }
  }

  test("splitHalf: a real group signal is reliable; pure noise is not") {
    // strong signal: group mean spans 0..900, within-group jitter tiny
    val strong = (1 to 2000).map { i =>
      val g = i % 10
      (i.toLong, s"g$g", g * 100.0 + (i % 7))
    }.toDF("id", "g", "v")
    val s = Reliability.splitHalf(strong, "g", "id", col("v")).collect().head
    assert(s.getAs[Double]("reliability") > 0.99,
      s"got ${s.getAs[Double]("reliability")}")
    // no group signal at all: same distribution everywhere
    val noise = (1 to 2000).map(i => (i.toLong, s"g${i % 10}", ((i * 7919) % 100).toDouble))
      .toDF("id", "g", "v")
    val n = Reliability.splitHalf(noise, "g", "id", col("v")).collect().head
    assert(math.abs(n.getAs[Double]("r_half")) < 0.7,
      s"noise halves must decorrelate, got ${n.getAs[Double]("r_half")}")
  }

  test("splitHalf: one-row groups are dropped and counted") {
    val rows = ((1 to 100).map(i => (i.toLong, s"g${i % 4}", i.toDouble)) :+
      (9999L, "solo", 1.0)).toDF("id", "g", "v")
    val r = Reliability.splitHalf(rows, "g", "id", col("v")).collect().head
    assert(r.getAs[Long]("n_dropped") >= 1L)
  }

  test("bestThreshold: separable scores pick the separating cutoff") {
    // positives score ~0.8, negatives ~0.2: the optimal cut is between
    val rows = ((1 to 100).map(i => ("g", 0.8 + (i % 5) * 0.01, true)) ++
      (1 to 100).map(i => ("g", 0.2 + (i % 5) * 0.01, false))).toDF("g", "s", "y")
    val r = Evaluation.bestThreshold(rows, Seq("g"), "s", col("y"), 1.0, 1.0)
      .collect().head
    val t = r.getAs[Double]("threshold")
    assert(t > 0.25 && t <= 0.8, s"cutoff must separate, got $t")
    assert(r.getAs[Long]("tp") == 100L && r.getAs[Long]("fp") == 0L)
    assert(r.getAs[Double]("utility") == 100.0)
  }

  test("bestThreshold: a high FP cost pushes the cutoff up") {
    // mixed region: cutting low catches all positives but many negatives
    val rows = ((1 to 50).map(i => ("g", 0.9, true)) ++
      (1 to 50).map(i => ("g", 0.5, true)) ++
      (1 to 200).map(i => ("g", 0.5, false))).toDF("g", "s", "y")
    val cheap = Evaluation.bestThreshold(rows, Seq("g"), "s", col("y"), 1.0, 0.1)
      .collect().head
    val dear = Evaluation.bestThreshold(rows, Seq("g"), "s", col("y"), 1.0, 5.0)
      .collect().head
    assert(cheap.getAs[Double]("threshold") < dear.getAs[Double]("threshold"),
      s"${cheap.getAs[Double]("threshold")} !< ${dear.getAs[Double]("threshold")}")
    assert(dear.getAs[Long]("fp") == 0L, "at 5x cost the mixed bin must be cut")
  }
}
