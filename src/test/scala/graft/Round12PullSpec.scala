package graft

import graft.ann.{Opq, Pca}
import org.apache.spark.sql.functions._

/** Round-12 deepening pulls: the two spec-only ANN legs promoted to
  * hash oracles — PCA's distributed moment pass (`q_pca_cov` /
  * `Pca.covarianceFrame`) and OPQ's apply path (`q_opq_encode` /
  * `Opq.rotateColumn` + encode in rotated space). These tests pin the
  * Scala-side semantics the oracle SQL was written against.
  */
class Round12PullSpec extends SparkSpec {
  import spark.implicits._

  test("covarianceFrame: hand-computed covariance on a 3-vector corpus") {
    // x1=(1,2), x2=(3,0), x3=(5,4): mean=(3,2), deviations
    // (-2,0),(0,-2),(2,2) -> cov = [[4, 2], [2, 4]] (unbiased, n-1 = 2)
    val df = Seq(
      (1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 0.0)), (3L, Seq(5.0, 4.0)))
      .toDF("vec_id", "embedding")
    val got = Pca.covarianceFrame(df).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.size == 4)
    assert(math.abs(got((0L, 0L)) - 4.0) < 1e-12)
    assert(math.abs(got((1L, 1L)) - 4.0) < 1e-12)
    assert(math.abs(got((0L, 1L)) - 2.0) < 1e-12)
    assert(math.abs(got((1L, 0L)) - 2.0) < 1e-12)
  }

  test("covarianceFrame agrees with the covariance Pca.fit diagonalizes") {
    // fit's variance-along-component property holds iff both paths see
    // the same matrix: reconstruct fit's implied total variance (trace)
    // and compare with the frame's diagonal sum.
    val rnd = new scala.util.Random(7)
    val rows = (1L to 40L).map(i => (i, Seq.fill(6)(rnd.nextGaussian())))
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, k = 6, idCol = "vec_id")
    val diag = Pca.covarianceFrame(df).filter(col("i") === col("j"))
      .agg(sum("cov")).collect()(0).getDouble(0)
    val trace = model.eigenvalues.sum
    assert(math.abs(diag - trace) < 1e-9,
      s"frame trace $diag != fit eigenvalue sum $trace")
    // and the frame is symmetric by construction of the outer product
    val asym = Pca.covarianceFrame(df).as[(Long, Long, Double)].collect()
      .map { case (i, j, c) => ((i, j), c) }.toMap
    for (((i, j), c) <- asym) assert(math.abs(c - asym((j, i))) < 1e-12)
  }

  test("rotateColumn with a permutation matrix is an exact permutation") {
    // the q_opq_encode contract: y_j = x_(37j mod 64), bit-exact (the
    // 63 zero products add nothing in float), so SQL list indexing
    // replays it hash-identically.
    val perm = IndexedSeq.tabulate(64, 64)((i, j) => if (i == (37 * j) % 64) 1.0 else 0.0)
    val vec = Seq.tabulate(64)(i => i * 0.123 - 3.7)
    val df = Seq((1L, vec)).toDF("vec_id", "embedding")
    val y = df.select(Opq.rotateColumn(col("embedding"), perm).as("y"))
      .collect()(0).getSeq[Double](0)
    for (j <- 0 until 64)
      assert(y(j) == vec((37 * j) % 64), s"dim $j: ${y(j)} != ${vec((37 * j) % 64)}")
    // and the stride matrix IS orthonormal: R·Rᵀ = I
    for (a <- 0 until 64; b <- 0 until 64) {
      val dot = (0 until 64).map(k => perm(a)(k) * perm(b)(k)).sum
      assert(dot == (if (a == b) 1.0 else 0.0))
    }
  }
}
