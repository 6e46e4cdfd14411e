package graft.ann

import graft.functions.VectorSum.vectorSum
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column — the linear
  * complement of [[Opq]]'s rotation: where OPQ re-mixes dimensions to
  * balance PQ blocks, PCA ranks directions by variance, giving (a) the
  * variance-explained curve that says whether 64 dims are really 12
  * (the embedding-health question), (b) a decorrelating/whitening
  * transform before cosine LSH or k-means, and (c) a principled
  * dimensionality cut that shrinks every downstream ANN distance.
  *
  * Scale shape: ONE corpus pass aggregates n, Σx and the flattened
  * Σxxᵀ outer-product moments through the map-side [[graft.functions
  * .VectorSum]] (d and d² bounded buffers — 64-dim embeddings carry a
  * 4096-double buffer per partition, never a corpus-sized frame); the
  * d×d eigenproblem solves on the driver (Breeze eigSym, microseconds
  * at d = 64) exactly like [[Opq.fit]]'s Procrustes step. Projection is
  * [[Opq.rotateColumn]]'s literal mat-vec — codegen'd, no UDF, no join.
  *
  * Double sums ARE reduction-order-dependent (like every float
  * aggregate), so PCA is spec-pinned by properties (orthonormality,
  * variance ordering, reconstruction) rather than hash-matched — the
  * eigenvector SIGN is fixed (largest-|weight| coordinate positive) so
  * repeated fits on the same partitioning agree.
  */
object Pca {

  /** Fitted basis: `mean` (d), `components` (k rows × d, variance-
    * descending, sign-fixed), `explained` (k variance-explained ratios).
    */
  final case class Model(
      mean: IndexedSeq[Double],
      components: IndexedSeq[IndexedSeq[Double]],
      explained: IndexedSeq[Double],
      eigenvalues: IndexedSeq[Double])

  /** Fit a k-component PCA. `k` ≤ d; rows with NULL vectors are
    * skipped. Covariance uses the unbiased 1/(n−1) scaling; requires
    * n ≥ 2.
    */
  def fit(
      vectors: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Model = {
    require(k >= 1, s"k must be >= 1, got $k")
    val x = col(vecCol).cast("array<double>")
    // row-local flattened outer product x⊗x (d² array), then ONE
    // map-side-partial VectorSum pass for all moments together
    // native x⊗x kernel (graft.functions.OuterFlat): same row-major
    // layout and per-position null semantics as the composable
    // flatten(transform(transform)) form, without its O(d²) interpreted
    // lambda dispatch per row (guide §4)
    val outer = graft.functions.MatOps.outerFlat(x)
    val row = vectors
      .filter(col(vecCol).isNotNull)
      .agg(
        count(lit(1)).as("n"),
        vectorSum(x).as("sx"),
        vectorSum(outer).as("sxx"))
      .head()
    val n = row.getAs[Long]("n")
    require(n >= 2, s"PCA needs at least 2 vectors, got $n")
    val sx = row.getAs[Seq[Double]]("sx").toArray
    val sxx = row.getAs[Seq[Double]]("sxx").toArray
    val d = sx.length
    require(k <= d, s"k must be <= dim $d, got $k")
    val mean = sx.map(_ / n)
    val cov = breeze.linalg.DenseMatrix.tabulate(d, d) { (i, j) =>
      (sxx(i * d + j) - n * mean(i) * mean(j)) / (n - 1).toDouble
    }
    // eigSym returns ascending eigenvalues; take the top k descending
    val es = breeze.linalg.eigSym((cov + cov.t) *:* 0.5)
    val order = (0 until d).sortBy(i => -es.eigenvalues(i)).take(k)
    val trace = (0 until d).map(es.eigenvalues(_)).map(math.max(_, 0.0)).sum
    val comps = order.map { i =>
      val v = (0 until d).map(r => es.eigenvectors(r, i))
      // sign fix: the largest-|weight| coordinate points positive
      val pivot = v.indices.maxBy(j => (math.abs(v(j)), -j))
      if (v(pivot) < 0) v.map(-_) else v
    }
    Model(
      mean.toIndexedSeq,
      comps.toIndexedSeq,
      order.map(i => if (trace > 0) math.max(es.eigenvalues(i), 0.0) / trace else 0.0).toIndexedSeq,
      order.map(i => es.eigenvalues(i)).toIndexedSeq)
  }

  /** The distributed half of [[fit]] exposed as a frame: the unbiased
    * covariance matrix as (i, j, cov) rows (d² of them), computed by
    * the SAME one-corpus-pass moment shape fit uses — count + Σx + the
    * flattened Σxxᵀ through map-side [[graft.functions.VectorSum]]
    * partials — then unpacked declaratively (posexplode on the d²
    * array; no collect, no driver math). This is the leg of PCA that
    * has to survive 100 TB; the d×d eigenproblem that follows is
    * driver-side Breeze either way. cov = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/(n−1),
    * algebraically identical to [[fit]]'s centering (differs only in
    * float rounding below any reported precision).
    */
  def covarianceFrame(vectors: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val x = col(vecCol).cast("array<double>")
    // native x⊗x kernel (graft.functions.OuterFlat): same row-major
    // layout and per-position null semantics as the composable
    // flatten(transform(transform)) form, without its O(d²) interpreted
    // lambda dispatch per row (guide §4)
    val outer = graft.functions.MatOps.outerFlat(x)
    vectors
      .filter(col(vecCol).isNotNull)
      .agg(
        count(lit(1)).as("n"),
        vectorSum(x).as("sx"),
        vectorSum(outer).as("sxx"))
      // Mirror fit's n >= 2 contract (round-12 ADVICE): the unbiased
      // (n-1) divisor below would otherwise turn an empty or
      // single-vector input into silent NaN/Inf/null covariance rows —
      // a degenerate edge that also diverges from the DuckDB oracle's
      // divide-by-zero behavior. Fail loudly instead.
      .select(
        when(col("n") >= 2, col("n")).otherwise(raise_error(concat(
          lit("covarianceFrame: the unbiased covariance needs at least "),
          lit("2 non-null vectors, got "), col("n"))).cast("long")).as("n"),
        col("sx"), col("sxx"))
      .select(col("n"), col("sx"), size(col("sx")).as("d"),
        posexplode(col("sxx")).as(Seq("p", "sxx")))
      .select(
        (col("p") / col("d")).cast("long").as("i"),
        pmod(col("p"), col("d")).cast("long").as("j"),
        ((col("sxx")
          - element_at(col("sx"), (col("p") / col("d")).cast("int") + 1)
            * element_at(col("sx"), pmod(col("p"), col("d")).cast("int") + 1) / col("n"))
          / (col("n") - 1)).as("cov"))
  }

  /** Project vectors onto the fitted basis: (idCol, proj[k]); when
    * `whiten`, each coordinate is scaled by 1/√λ so downstream
    * Euclidean distance is Mahalanobis in the original space.
    * Eigenvalues ≤ 1e-12 whiten to 0 (a dead direction carries no
    * signal, and 1/√λ would explode float noise).
    */
  def project(
      df: DataFrame,
      model: Model,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      whiten: Boolean = false): DataFrame = {
    val d = model.mean.length
    val scale = model.eigenvalues.map { l =>
      if (whiten) { if (l > 1e-12) 1.0 / math.sqrt(l) else 0.0 } else 1.0
    }
    val meanLit = typedlit(model.mean.toSeq)
    val compLit = typedlit(model.components.map(_.toSeq).toSeq)
    val scaleLit = typedlit(scale.toSeq)
    val centered = zip_with(col(vecCol).cast("array<double>"), meanLit, (a, m) => a - m)
    val proj = transform(sequence(lit(0), lit(model.components.length - 1)), c =>
      aggregate(
        zip_with(centered, element_at(compLit, c + 1), (xi, wi) => xi * wi),
        lit(0.0), (acc, v) => acc + v) * element_at(scaleLit, c + 1))
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol), proj.as("proj"))
  }
}
