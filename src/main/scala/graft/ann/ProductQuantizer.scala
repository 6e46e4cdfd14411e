package graft.ann

import graft.plans.Materialize.PinOps
import graft.functions.VectorSum.vectorSum
import graft.text.TextFunctions.md5Hash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization: compress a `dim`-float embedding to `numBlocks`
  * small codes (one byte each at k ≤ 256) and search with asymmetric
  * distance computation (ADC) — the standard memory-scale path for
  * billion-vector ANN (a 64-dim float corpus shrinks 32×: 256 B → 8 B
  * per vector).
  *
  * Training runs ALL blocks in one generalized-Lloyd loop: vectors
  * explode to (id, blk, sub-vector) rows once per iteration, centroids
  * for every block ride one broadcast, re-centering is a single
  * groupBy(blk, cid) with the map-side [[graft.functions.VectorSum]]
  * partial — m separate per-block k-means fits would scan the corpus m
  * times per iteration; this shape scans it once.
  *
  * Search-time ADC: the per-query distance table (numBlocks × k, a few
  * KB) is computed from a LITERAL centroid array (collected once from
  * the tiny model — m·k·blockDim doubles), so the scored plan is a
  * broadcast of queries against the codes table and a codegen'd
  * zip_with/aggregate lookup — no join on the corpus side, no shuffle
  * until the bounded top-k.
  */
object ProductQuantizer {

  /** Trained model: `centroids(blk)(cid)` is a blockDim-length centroid. */
  final case class Model(
      numBlocks: Int,
      blockDim: Int,
      k: Int,
      centroids: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]
  ) {
    require(centroids.length == numBlocks && centroids.forall(_.length == k))
  }

  private def subVectors(vecCol: Column, numBlocks: Int, blockDim: Int): Column =
    array((0 until numBlocks).map { b =>
      struct(lit(b).as("blk"), slice(vecCol.cast("array<double>"), b * blockDim + 1, blockDim).as("sub"))
    }: _*)

  /** Generalized Lloyd over all blocks at once. Deterministic hash-seeded
    * init per block; empty clusters keep their previous centroid.
    */
  def fit(
      vectors: DataFrame,
      numBlocks: Int = 8,
      k: Int = 16,
      iters: Int = 3,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: String = "graft"
  ): Model = {
    require(dim % numBlocks == 0, s"dim $dim must divide into $numBlocks blocks")
    val blockDim = dim / numBlocks
    val subs = vectors.select(
      col(idCol).as("id"),
      explode(subVectors(col(vecCol), numBlocks, blockDim)).as("s")
    ).select(col("id"), col("s.blk").as("blk"), col("s.sub").as("sub"))

    // init: per block, the k sub-vectors with smallest (seed, id) hash
    var centroids = subs
      .withColumn("__h", md5Hash32(concat_ws("|", lit(seed), col("id").cast("string"))))
      .withColumn("__r", row_number().over(Window.partitionBy("blk").orderBy(col("__h"), col("id"))))
      .filter(col("__r") <= k)
      .select(col("blk"), (col("__r") - 1).cast("long").as("cid"), col("sub").as("centroid"))
      .pin(true)

    for (_ <- 0 until iters) {
      val assigned = subs
        .join(broadcast(centroids), "blk")
        .select(col("id"), col("blk"), col("sub"),
          struct(KMeans.sqDist(col("sub"), col("centroid")).as("dist"), col("cid")).as("__c"))
        .groupBy("id", "blk")
        .agg(first(col("sub")).as("sub"), min(col("__c")).as("__m"))
        .select(col("blk"), col("__m.cid").as("cid"), col("sub"))
      val means = assigned
        .groupBy("blk", "cid")
        .agg(vectorSum(col("sub")).as("__sum"), count(lit(1)).as("__n"))
        .select(col("blk"), col("cid"), transform(col("__sum"), x => x / col("__n")).as("centroid"))
      centroids = centroids.as("old")
        .join(means.as("new"), Seq("blk", "cid"), "left")
        .select(col("blk"), col("cid"),
          coalesce(col("new.centroid"), col("old.centroid")).as("centroid"))
        .pin(true)
    }

    val collected = centroids
      .orderBy("blk", "cid")
      .collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue(), r.getSeq[Double](2).toIndexedSeq))
    val byBlock = collected.groupBy(_._1)
    Model(numBlocks, blockDim, k,
      (0 until numBlocks).map(b => byBlock(b.toLong).sortBy(_._2).map(_._3).toIndexedSeq))
  }

  private def centroidLit(model: Model): Column =
    typedlit(model.centroids.map(_.map(_.toSeq).toSeq).toSeq)

  /** codes(blk) = nearest sub-centroid of `vec`'s blk-th sub-vector,
    * against the literal centroid array — a pure projection (no join,
    * no shuffle).
    */
  def codesColumn(model: Model, vec: Column): Column =
    // native per-block argmin (graft.functions.PqCodes) — replaces the
    // interpreted slice + aggregate-over-sequence fold whose per-row
    // struct boxing dominated the encode path (guide §4); candidate
    // order, strict-< tie handling and the -1 no-winner convention are
    // bit-identical to the composable form
    graft.functions.MatOps.pqCodes(
      vec.cast("array<double>"),
      model.centroids.map(_.map(_.toArray).toArray).toArray)

  /** Reconstruction ŷ from PQ codes: concatenation of each block's
    * centroid — again a pure literal-lookup projection.
    */
  def decodeColumn(model: Model, codes: Column): Column = {
    val cents = centroidLit(model)
    flatten(transform(codes, (code, blk) =>
      element_at(element_at(cents, blk + 1), code + 1)))
  }

  /** Encode vectors to (id, codes: array<int>). */
  def encode(
      vectors: DataFrame,
      model: Model,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    vectors.select(col(idCol).as("id"), codesColumn(model, col(vecCol)).as("codes"))

  /** Approximate top-k by ADC: per query, a (numBlocks × k) distance
    * table from the literal centroids; each corpus row's distance is the
    * sum of `numBlocks` table lookups (zip_with + aggregate, codegen'd).
    * Ranking via the bounded-heap aggregate on negated distance.
    */
  def searchADC(
      codes: DataFrame,
      queries: DataFrame,
      model: Model,
      kTop: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val cents = centroidLit(model)
    val dtable = transform(
      subVectors(col(vecCol), model.numBlocks, model.blockDim),
      s => transform(
        element_at(cents, s.getField("blk") + 1),
        c => KMeans.sqDist(s.getField("sub"), c))
    )
    val q = queries.select(col(idCol).as("query_id"), dtable.as("__dt"))
    // native table-lookup sum (graft.functions.AdcLookup) — replaces the
    // interpreted zip_with+aggregate fold that ran per (corpus row ×
    // query) pair (guide §4); same left-to-right accumulation, parity
    // pinned in MatOpsSpec
    val adc = graft.functions.MatOps.adcLookup(col("codes"), col("__dt"))
    val scored = codes
      .crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"), (-adc).as("cos"))
    Similarity.topKFromScores(scored, kTop)
      .withColumnRenamed("cosine", "neg_adc_dist")
  }
}
