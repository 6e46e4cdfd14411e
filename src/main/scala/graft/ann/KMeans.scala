package graft.ann

import graft.plans.Materialize.PinOps
import graft.functions.VectorSum.vectorSum
import graft.text.TextFunctions.md5Hash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the coarse-
  * quantizer trainer for real IVF ANN search (cells = learned centroids
  * instead of [[Similarity.signBitCell]]'s data-blind sign bits).
  *
  * Scale shape per iteration: centroids are k×dim (kilobytes) and ride a
  * broadcast; assignment is a broadcast nested-loop over k candidates
  * folded to an argmin per row (no shuffle of the corpus); re-centering is
  * ONE groupBy(cid) with the map-side [[graft.functions.VectorSum]]
  * partial — the exchange carries one dim-length buffer per (partition ×
  * centroid). The corpus is never collected, sorted, or windowed.
  *
  * Init and assignment are bitwise deterministic (hash-seeded init,
  * strict left-to-right distance folds, min-by-(dist, cid) tie-breaks).
  * Re-centering is deterministic up to double-summation order — partial
  * aggregation merges in scheduling order, so fitted centroids can differ
  * in the low bits across runs (inherent to any distributed mean).
  */
object KMeans {

  /** Strict left-to-right squared-L2 distance between two array columns.
    * Backed by the native codegen'd [[graft.functions.SqDist]] expression
    * — bit-identical to the interpreted `aggregate(zip_with(...))` fold
    * (same accumulation order), but it runs inside whole-stage codegen,
    * which dominates the corpus × k assignment loop.
    */
  def sqDist(a: Column, b: Column): Column = graft.functions.GraftFunctions.sqDist(a, b)

  /** Deterministic init: the k vectors with the smallest (seed, id) hash
    * (ties by id), numbered 0..k-1 in that order. The hash spreads the
    * seeds uniformly over the corpus — the cheap, reproducible cousin of
    * random-restart init (k-means++ needs k sequential passes; at corpus
    * scale the hash seeding + a couple extra Lloyd iterations is the
    * better trade). Output: (cid, centroid: array<double>).
    */
  def initCentroids(
      vectors: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: String = "graft"
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    vectors
      .withColumn("__h", md5Hash32(concat_ws("|", lit(seed), col(idCol).cast("string"))))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      // bounded window: at most k rows survive the limit above
      .withColumn("cid", (row_number().over(Window.orderBy(col("__h"), col(idCol))) - 1).cast("long"))
      .select(col("cid"), col(vecCol).cast("array<double>").as("centroid"))
  }

  /** Assign each vector to its nearest centroid: (id, vec, cid, dist).
    * Ties break to the lowest cid (min over (dist, cid) structs).
    */
  def assign(
      vectors: DataFrame,
      centroids: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    // the centroid frame is bounded (k rows — the IVF-index artifact), so
    // it collects once and rides into the scan as an expression reference
    // object. The former crossJoin(broadcast) → groupBy(id).min(struct)
    // form materialized and SHUFFLED N×k rows with the vector payload —
    // with SemDeDup's corpus-scaled k that is O(N²/250) exchanged rows,
    // measured 48x cost for 10x data at the 100x bench scale. The
    // codegen'd argmin keeps the identical min-(dist, cid) semantics
    // (SqDist's accumulation order, tie to lowest cid) with zero extra
    // rows and zero shuffle.
    val rows = centroids
      .select(col("cid").cast("long"), col("centroid").cast("array<double>"))
      .collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    val cids = rows.map(_.getLong(0))
    val mat = rows.map(_.getSeq[Double](1).toArray)
    vectors
      .select(col(idCol), col(vecCol),
        graft.functions.NearestCentroid.nearest(col(vecCol), cids, mat).as("__m"))
      .select(col(idCol), col(vecCol), col("__m.cid").as("cid"), col("__m.dist").as("dist"))
  }

  /** `iters` Lloyd iterations from the hash-seeded init. A centroid that
    * captures no vectors keeps its previous position (standard empty-
    * cluster handling). Centroid frames are tiny; each round is eagerly
    * checkpointed so the loop's lineage stays flat.
    */
  def fit(
      vectors: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: String = "graft"
  ): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    var centroids = initCentroids(vectors, k, idCol, vecCol, seed).pin(true)
    for (_ <- 0 until iters) {
      val means = assign(vectors, centroids, idCol, vecCol)
        .groupBy("cid")
        .agg(vectorSum(col(vecCol)).as("__sum"), count(lit(1)).as("__n"))
        .select(col("cid"), transform(col("__sum"), x => x / col("__n")).as("centroid"))
      centroids = centroids.as("old")
        .join(means.as("new"), Seq("cid"), "left")
        .select(col("cid"), coalesce(col("new.centroid"), col("old.centroid")).as("centroid"))
        .pin(true)
    }
    centroids
  }

  /** IVF search with learned centroids: bucket the corpus by nearest
    * centroid once (a build-time pass over the corpus), assign each query
    * to its `nProbe` nearest cells, and rank candidates within the probed
    * cells — candidate generation is an equi-join on cid, and recall is
    * tuned by `nProbe` instead of being fixed by a single cell.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      k: Int,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(nProbe > 0, s"nProbe must be positive, got $nProbe")
    val corpusCells = assign(corpus, centroids, idCol, vecCol)
      .select(col(idCol), col(vecCol), col("cid"))
    val queryCells = queries
      .crossJoin(broadcast(centroids))
      .select(col(idCol), col(vecCol), col("cid"),
        sqDist(col(vecCol), col("centroid")).as("__d"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("__d"), col("cid"))))
      .filter(col("__r") <= nProbe)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"), col("cid"))
    val scored = corpusCells.as("c")
      .join(broadcast(queryCells.as("q")), col("c.cid") === col("q.cid") && col(s"c.$idCol") =!= col("query_id"))
      .select(
        col("query_id"),
        col(s"c.$idCol").as("neighbor_id"),
        Similarity.cosine(col("__qv"), col(s"c.$vecCol")).as("cos")
      )
    Similarity.topKFromScores(scored, k)
  }
}
