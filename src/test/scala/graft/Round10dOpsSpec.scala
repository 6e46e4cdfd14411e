package graft

import graft.operators.{Bootstrap, Hypothesis, Stats, Transitions}
import graft.ann.RandomProjection
import org.apache.spark.sql.functions._

/** Round-10 batch X: bootstrap median band, JL projection distortion,
  * Markov backtest, SRM sweep composition, top-terms drift.
  */
class Round10dOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bootstrapMedianCI: the observed median is exact; the band brackets it sanely") {
    val df = (1 to 9).map(v => ("g", v.toLong, v.toLong)).toDF("g", "v", "id")
    val got = Bootstrap.bootstrapMedianCI(df, Seq("g"), "v", "id", replicas = 16)
      .collect()(0)
    assert(got.getAs[Long]("n") == 9L)
    assert(got.getAs[Double]("median_obs") == 5.0)
    val lo = got.getAs[Double]("boot_lo"); val hi = got.getAs[Double]("boot_hi")
    assert(lo >= 1.0 && hi <= 9.0 && lo <= hi)
    assert(got.getAs[Long]("k_effective") == 16L,
      "9-row replicas essentially never draw all-zero weight")
    // determinism: same seed, same band
    val again = Bootstrap.bootstrapMedianCI(df, Seq("g"), "v", "id", replicas = 16)
      .collect()(0)
    assert(again.getAs[Double]("boot_lo") == lo && again.getAs[Double]("boot_hi") == hi)
  }

  test("RandomProjection.project: a basis vector reads the plane column at 1/sqrt(k)") {
    val e0 = Array(1.0f) ++ Array.fill(63)(0.0f)
    val df = Seq(Tuple1(e0.toSeq)).toDF("v")
    val got = df.select(RandomProjection.project(col("v"), k = 16, dim = 64).as("p"))
      .collect()(0).getSeq[Double](0)
    assert(got.size == 16)
    val expected = graft.ann.Srp.planes(16, 64, "jl").map(_(0) * 0.25)
    assert(got.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("distortionReport: ratios are positive, ordered, and zero-distance pairs are counted") {
    val vecs = (0L until 6L).map { i =>
      (i, (0 until 64).map(d => if (d % 5 == i % 5) 1.0f + i else 0.1f * d))
    } :+ ((6L, (0 until 64).map(d => if (d % 5 == 0) 1.0f else 0.1f * d))) // dup of id 0
    val df = vecs.toDF("vec_id", "embedding")
    val got = RandomProjection.distortionReport(df, k = 16, dim = 64, maxId = 7L)
      .collect()(0)
    assert(got.getAs[Long]("n_pairs") + got.getAs[Long]("n_zero_dist") == 21L)
    assert(got.getAs[Long]("n_zero_dist") == 1L, "ids 0 and 6 are identical vectors")
    val (mn, me, mx) = (got.getAs[Double]("ratio_min"),
      got.getAs[Double]("ratio_mean"), got.getAs[Double]("ratio_max"))
    assert(mn > 0 && mn <= me && me <= mx)
  }

  test("markovBacktest: argmax transitions from train keys score test keys") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      (0L, t(0), "A", 1L), (0L, t(1), "B", 2L), (0L, t(2), "A", 3L), (0L, t(3), "B", 4L),
      (1L, t(0), "A", 5L), (1L, t(1), "B", 6L), (1L, t(2), "A", 7L), (1L, t(3), "C", 8L))
      .toDF("u", "ts", "et", "id")
    val got = Transitions.markovBacktest(ev, "u", "ts", "et", "id",
      pmod(col("u"), lit(2)) === 0)
      .collect().map(r => r.getAs[String]("prev") -> r).toMap
    val a = got("A")
    assert(a.getAs[String]("predicted") == "B")
    assert(a.getAs[Long]("n_train") == 2L)
    assert(a.getAs[Long]("n_test") == 2L && a.getAs[Long]("n_correct") == 1L)
    assert(a.getAs[Double]("accuracy") == 0.5)
    val b = got("B")
    assert(b.getAs[String]("predicted") == "A", "train's only B bigram is B->A")
    assert(b.getAs[Long]("n_test") == 1L && b.getAs[Long]("n_correct") == 1L)
    assert(b.getAs[Double]("accuracy") == 1.0)
  }

  test("srm sweep pieces: a forced imbalance is the rejected slice") {
    val rows = (0 until 400).map(i => ("bal", i % 2 == 0)) ++
      (0 until 200).map(_ => ("skew", true))
    val tests = Stats.sampleRatioMismatch(rows.toDF("src", "b"), Seq("src"),
        col("b"), expectedB = 0.5)
      .select(col("src"), graft.functions.Portable.r6(col("chi2")).as("chi2"),
        graft.functions.Portable.r6(
          Hypothesis.pFromZ(sqrt(col("chi2")))).as("p"))
    val got = Hypothesis.benjaminiHochberg(tests, "p", Seq("src"), alpha = 0.05)
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Boolean]("reject")).toMap
    assert(got("skew") && !got("bal"))
  }
}
