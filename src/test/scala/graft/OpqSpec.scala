package graft

import breeze.linalg.{qr, DenseMatrix}
import graft.ann.{Opq, ProductQuantizer}
import org.apache.spark.sql.functions._

class OpqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val blocks = 4
  private val k = 4

  /** Deterministic dense orthonormal matrix (QR of a fixed matrix). */
  private lazy val scramble: DenseMatrix[Double] = {
    val a = DenseMatrix.tabulate(dim, dim)((i, j) => math.sin(1.0 + i * dim + j))
    qr(a).q
  }

  /** Latent data PQ could encode losslessly if blocks were axis-aligned:
    * per 2-dim block, one of 4 patterns. The fixed rotation then smears
    * every block's structure across all blocks — the exact failure mode
    * OPQ exists to undo.
    */
  private lazy val corpus = {
    val patterns = Seq((0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0))
    val rows = (0 until 200).map { i =>
      val z = (0 until blocks).flatMap { b =>
        val p = patterns(math.abs((i * 31 + b * 17) % 4))
        Seq(p._1, p._2)
      }
      val x = (0 until dim).map(j => (0 until dim).map(c => z(c) * scramble(c, j)).sum)
      (i.toLong, x)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("opq rotation is orthonormal") {
    val model = Opq.fit(corpus, numBlocks = blocks, k = k, opqIters = 2, pqIters = 2, dim = dim)
    val r = model.rotation
    for (i <- 0 until dim; j <- 0 until dim) {
      val dot = (0 until dim).map(c => r(c)(i) * r(c)(j)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"RtR($i,$j) = $dot")
    }
  }

  test("opq beats plain PQ on cross-block-correlated data") {
    val pqPlain = ProductQuantizer.fit(corpus, blocks, k, iters = 4, dim = dim)
    val plainErr = Opq.reconstructionError(
      corpus, Opq.Model(IndexedSeq.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0), pqPlain))
    val opq = Opq.fit(corpus, numBlocks = blocks, k = k, opqIters = 5, pqIters = 4, dim = dim)
    val opqErr = Opq.reconstructionError(corpus, opq)
    assert(plainErr > 0.1, s"fixture should defeat plain PQ, err=$plainErr")
    assert(opqErr < plainErr * 0.5, s"opq=$opqErr should undercut plain=$plainErr by 2x+")
  }

  test("opq encode/search round-trip retrieves an exact duplicate at rank 1") {
    val model = Opq.fit(corpus, numBlocks = blocks, k = k, opqIters = 2, pqIters = 3, dim = dim)
    val codes = Opq.encode(corpus, model)
    // query = an existing corpus vector under a fresh id. The fixture
    // repeats latent patterns with period 4 (pattern index (3i+b)%4), so
    // ids ≡ 7 (mod 4) are exact duplicates of id 7: the top hits must all
    // come from that duplicate class, ties broken by id (3 first).
    val q = corpus.filter(col("vec_id") === 7L).select(lit(9999L).as("vec_id"), col("embedding"))
    val top = Opq.searchADC(codes, q, model, kTop = 3)
      .orderBy(col("rank")).select("neighbor_id").as[Long].collect()
    assert(top.contains(7L) && top.forall(_ % 4 == 3),
      s"expected duplicates of 7 (ids ≡ 3 mod 4), got ${top.toSeq}")
  }
}
