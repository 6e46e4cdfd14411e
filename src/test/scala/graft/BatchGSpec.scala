package graft

import graft.operators.{BradleyTerry, Evaluation}
import graft.pipeline.{Sampling, Splits}
import org.apache.spark.sql.functions._

/** Round-8 batch G: Bradley-Terry, Brier decomposition, Neyman
  * allocation, k-fold CV of the group-mean predictor.
  */
class BatchGSpec extends SparkSpec {
  import spark.implicits._

  // ---- Bradley-Terry ----

  test("bt: a dominant item gets the top strength; transitive order is recovered") {
    // a beats b 9:1, b beats c 9:1, a beats c 9:1 — order a > b > c
    def reps(w: String, l: String, n: Int) = Seq.fill(n)((w, l))
    val pairs = (reps("a", "b", 9) ++ reps("b", "a", 1) ++
      reps("b", "c", 9) ++ reps("c", "b", 1) ++
      reps("a", "c", 9) ++ reps("c", "a", 1)).toDF("w", "l")
    val out = BradleyTerry.fit(pairs, "w", "l")
      .collect().map(r => r.getAs[String]("item") -> r).toMap
    val (ta, tb, tc) = (out("a").getAs[Double]("theta"),
      out("b").getAs[Double]("theta"), out("c").getAs[Double]("theta"))
    assert(ta > tb && tb > tc, s"expected a>b>c, got $ta $tb $tc")
    assert(out("a").getAs[Long]("n_wins") == 18L)
    assert(out("a").getAs[Long]("n_games") == 20L)
    // mean-1 normalization
    assert(math.abs((ta + tb + tc) / 3.0 - 1.0) < 1e-4)
  }

  test("bt: symmetric records give equal strengths; never-winners go to zero") {
    val pairs = (Seq.fill(5)(("x", "y")) ++ Seq.fill(5)(("y", "x")) ++
      Seq.fill(4)(("x", "z")) ++ Seq.fill(4)(("y", "z"))).toDF("w", "l")
    val out = BradleyTerry.fit(pairs, "w", "l")
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Double]("theta")).toMap
    assert(math.abs(out("x") - out("y")) < 1e-6, s"symmetric arms must tie: $out")
    assert(out("z") < 0.05, s"never-winner must collapse toward 0, got ${out("z")}")
  }

  // ---- Brier decomposition ----

  test("brier: perfectly calibrated bins have ~0 reliability; decomposition identity holds") {
    // score 0.2 bin with 20% positives, score 0.8 bin with 80% positives
    val rows = (1 to 100).map(i => ("g", 0.2, i % 5 == 0)) ++
      (1 to 100).map(i => ("g", 0.8, i % 5 != 0))
    val r = Evaluation.brierDecomposition(rows.toDF("g", "p", "y"), Seq("g"), "p", col("y"))
      .collect().head
    assert(r.getAs[Double]("reliability") < 1e-6, "calibrated => reliability 0")
    assert(r.getAs[Double]("resolution") > 0.05, "informative => positive resolution")
    val identity = r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
      r.getAs[Double]("uncertainty")
    assert(math.abs(identity - r.getAs[Double]("brier")) < 1e-4,
      s"Murphy identity must hold (constant p per bin): $identity vs ${r.getAs[Double]("brier")}")
  }

  test("brier: a constant uninformative score has 0 resolution") {
    val rows = (1 to 200).map(i => ("g", 0.5, i % 2 == 0))
    val r = Evaluation.brierDecomposition(rows.toDF("g", "p", "y"), Seq("g"), "p", col("y"))
      .collect().head
    assert(r.getAs[Double]("resolution") == 0.0)
    assert(math.abs(r.getAs[Double]("uncertainty") - 0.25) < 1e-6)
  }

  // ---- Neyman allocation ----

  test("neyman: budget flows to the high-variance stratum, not the big one") {
    val calm = (1 to 900).map(i => ("calm", 100.0 + (i % 3).toDouble)) // tiny sigma
    val wild = (1 to 100).map(i => ("wild", (i % 50) * 40.0)) // huge sigma
    val out = Sampling.neymanAllocation((calm ++ wild).toDF("s", "v"), "s", "v", 100L)
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    assert(out("wild").getAs[Long]("n_alloc") > out("calm").getAs[Long]("n_alloc"),
      "9x smaller but high-variance stratum must win budget")
    val total = out.values.map(_.getAs[Long]("n_alloc")).sum
    assert(total <= 100L)
    assert(total >= 95L, s"largest-remainder should spend nearly all budget, got $total")
  }

  test("neyman: allocation is capped at the stratum population") {
    val tiny = (1 to 3).map(i => ("tiny", i * 1000.0)) // huge sigma, n=3
    val big = (1 to 500).map(i => ("big", (i % 7).toDouble))
    val out = Sampling.neymanAllocation((tiny ++ big).toDF("s", "v"), "s", "v", 200L)
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    assert(out("tiny").getAs[Long]("n_alloc") <= 3L, "cannot sample more rows than exist")
  }

  test("neyman: zero-variance strata get zero allocation, visibly") {
    val const = (1 to 100).map(_ => ("const", 7.0))
    val vary = (1 to 100).map(i => ("vary", (i % 10).toDouble))
    val out = Sampling.neymanAllocation((const ++ vary).toDF("s", "v"), "s", "v", 50L)
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    assert(out("const").getAs[Double]("alloc_frac") == 0.0)
    assert(out("const").getAs[Long]("n_alloc") == 0L)
    assert(out("vary").getAs[Long]("n_alloc") == 50L)
  }

  // ---- k-fold CV ----

  test("kFoldGroupMeanCv: a constant-per-group signal cross-validates to ~0 error") {
    val rows = (1 to 1000).map(i => (i.toLong, s"g${i % 4}", (i % 4) * 10.0))
    val out = Splits.kFoldGroupMeanCv(rows.toDF("id", "g", "y"), "id", "g", "y")
      .collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Double]("mae") < 1e-9, s"fold ${r.getAs[Int]("fold")}: ${r.getAs[Double]("mae")}")
      assert(r.getAs[Long]("n_skipped") == 0L)
    }
  }

  test("kFoldGroupMeanCv: single-fold groups are skipped, not scored on themselves") {
    // group "solo" has one row: its fold's out-of-fold mean does not exist
    val rows = ((1 to 500).map(i => (i.toLong, "main", (i % 9).toDouble)) :+
      (9999L, "solo", 42.0)).toDF("id", "g", "y")
    val out = Splits.kFoldGroupMeanCv(rows, "id", "g", "y").collect()
    assert(out.map(_.getAs[Long]("n_skipped")).sum == 1L)
    assert(out.map(_.getAs[Long]("n_test")).sum == 500L)
    // rmse >= mae always
    out.filter(_.getAs[Long]("n_test") > 0).foreach { r =>
      assert(r.getAs[Double]("rmse") >= r.getAs[Double]("mae") - 1e-9)
    }
  }
}
