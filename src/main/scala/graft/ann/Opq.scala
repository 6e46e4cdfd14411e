package graft.ann

import graft.plans.Materialize.PinOps
import graft.functions.VectorSum.vectorSum
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimized Product Quantization (OPQ): learn an orthonormal rotation
  * `R` so that product quantization of `x·R` loses less than PQ of raw
  * `x`. PQ quantizes each block independently, so variance that spans
  * block boundaries (correlated dimensions split across blocks) is
  * invisible to it; OPQ's rotation re-mixes dimensions to balance
  * per-block variance before the split (Ge et al., "Optimized Product
  * Quantization", CVPR 2013 — non-parametric alternation).
  *
  * Alternating optimization, each round:
  *   1. fit PQ on the rotated corpus and reconstruct ŷ ≈ x·R;
  *   2. solve the orthogonal Procrustes problem min_R ‖X·R − Ŷ‖_F
  *      (R = U·Vᵀ from SVD(Xᵀ·Ŷ)).
  *
  * Scale shape: the only data-sized work per round is the PQ Lloyd fit
  * (already one-scan-per-iter) plus ONE global aggregate that sums the
  * per-row outer product x⊗ŷ — a map-side-combined `vectorSum` over
  * dim² doubles (64-dim → a 4 KB partial per task). The SVD runs on the
  * driver over that dim×dim matrix — O(dim³) on 64×64 is microseconds;
  * nothing corpus-sized ever leaves the executors. Rotation at
  * encode/search time is a per-row O(dim²) literal mat-vec projection,
  * the same cost class as the ADC table build.
  */
object Opq {

  /** rotation(i)(j): output dim j's weight on input dim i (y = x·R). */
  final case class Model(rotation: IndexedSeq[IndexedSeq[Double]], pq: ProductQuantizer.Model)

  private def identity(dim: Int): IndexedSeq[IndexedSeq[Double]] =
    IndexedSeq.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)

  /** y = x·R as a literal mat-vec projection — the native
    * [[graft.functions.MatOps.matVec]] kernel (no UDF, no join; the
    * matrix rides the plan as a task-local reference object). Replaces
    * the interpreted `transform(sequence, aggregate(zip_with))` fold,
    * whose O(dim²) per-row lambda dispatch dominated the OPQ encode
    * path (guide §4); accumulation order and null semantics are
    * bit-identical.
    */
  def rotateColumn(vec: Column, rotation: IndexedSeq[IndexedSeq[Double]]): Column = {
    val dim = rotation.length
    // MatOps.matVec takes output-major weights: cols(j)(i) = R[i][j]
    val cols = Array.tabulate(dim, dim)((j, i) => rotation(i)(j))
    graft.functions.MatOps.matVec(vec.cast("array<double>"), cols)
  }

  /** Orthogonal Procrustes: the R maximizing tr(Rᵀ·M) over orthonormal
    * matrices is U·Vᵀ for M = U·S·Vᵀ.
    */
  private def procrustes(m: breeze.linalg.DenseMatrix[Double]): IndexedSeq[IndexedSeq[Double]] = {
    val svd = breeze.linalg.svd(m)
    val r = svd.U * svd.Vt
    IndexedSeq.tabulate(r.rows, r.cols)((i, j) => r(i, j))
  }

  /** Sum over rows of the flattened outer product x⊗ŷ (dim² doubles),
    * reshaped driver-side into Xᵀ·Ŷ.
    */
  private def crossMatrix(rows: DataFrame, xCol: String, yCol: String, dim: Int): breeze.linalg.DenseMatrix[Double] = {
    val outer = flatten(transform(col(xCol).cast("array<double>"), xi =>
      transform(col(yCol), yj => xi * yj)))
    val flat = rows
      .select(outer.as("__o"))
      .agg(vectorSum(col("__o")).as("__m"))
      .collect()(0).getSeq[Double](0)
    // flat is row-major (outer loop over x's dims); tabulate handles layout
    breeze.linalg.DenseMatrix.tabulate(dim, dim)((i, j) => flat(i * dim + j))
  }

  /** Alternate Procrustes rotation updates with PQ refits. `opqIters`
    * rotation rounds, then a final PQ fit on the settled rotation.
    */
  def fit(
      vectors: DataFrame,
      numBlocks: Int = 8,
      k: Int = 16,
      opqIters: Int = 3,
      pqIters: Int = 3,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: String = "graft"
  ): Model = {
    require(dim % numBlocks == 0, s"dim $dim must divide into $numBlocks blocks")
    var rotation = identity(dim)
    // the alternation re-reads the corpus every round: materialize the
    // (typically upstream-expensive) input once
    val x = vectors.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("x"))
      .pin(false)
    for (_ <- 0 until opqIters) {
      val rotated = x.select(col("id"), col("x"), rotateColumn(col("x"), rotation).as("y"))
      val pq = ProductQuantizer.fit(rotated, numBlocks, k, pqIters, dim, "id", "y", seed)
      val withYhat = rotated.select(
        col("x"),
        ProductQuantizer.decodeColumn(pq, ProductQuantizer.codesColumn(pq, col("y"))).as("yhat"))
      rotation = procrustes(crossMatrix(withYhat, "x", "yhat", dim))
    }
    val finalRotated = x.select(col("id"), rotateColumn(col("x"), rotation).as("y"))
    Model(rotation, ProductQuantizer.fit(finalRotated, numBlocks, k, pqIters, dim, "id", "y", seed))
  }

  /** Encode with the learned rotation: (id, codes). */
  def encode(
      vectors: DataFrame,
      model: Model,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    vectors.select(
      col(idCol).as("id"),
      ProductQuantizer.codesColumn(model.pq, rotateColumn(col(vecCol), model.rotation)).as("codes"))

  /** ADC top-k in the rotated space: queries are rotated with the same
    * literal mat-vec, then scored exactly like [[ProductQuantizer.searchADC]].
    */
  def searchADC(
      codes: DataFrame,
      queries: DataFrame,
      model: Model,
      kTop: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    ProductQuantizer.searchADC(
      codes,
      queries.select(col(idCol), rotateColumn(col(vecCol), model.rotation).as(vecCol)),
      model.pq, kTop, idCol, vecCol)

  /** Mean squared reconstruction error of a fitted model over a corpus —
    * the quantity OPQ exists to reduce; exposed for specs/tuning.
    */
  def reconstructionError(
      vectors: DataFrame,
      model: Model,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Double = {
    val y = rotateColumn(col(vecCol), model.rotation)
    val yhat = ProductQuantizer.decodeColumn(model.pq, ProductQuantizer.codesColumn(model.pq, y))
    vectors
      .select(aggregate(zip_with(y, yhat, (a, b) => (a - b) * (a - b)), lit(0.0), (acc, v) => acc + v).as("e"))
      .agg(avg(col("e")).as("mse"))
      .collect()(0).getDouble(0)
  }
}
