package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Signed-random-projection (SRP) LSH for COSINE similarity — the
  * hyperplane-hashing complement to the Jaccard-oriented MinHash family
  * (Charikar 2002, "Similarity estimation techniques from rounding
  * algorithms"). The reference has no ANN surface at all; this extends
  * graft's LLM-pipeline side alongside [[Similarity.embeddingNearDupPairs]]
  * (whose sign-bit cells are axis-ALIGNED — SRP's random hyperplanes make
  * the buckets rotation-invariant, so recall does not depend on which
  * coordinates happen to carry the signal).
  *
  * Determinism: hyperplanes are Rademacher vectors (components ±1) derived
  * from the parity of md5Hash32("srp:plane:dim") — fixed public constants
  * any engine re-derives from md5, like [[graft.dedup.Dedup.MinhashParams]].
  * P(sign agrees) = 1 − θ/π, so banded signatures bucket high-cosine pairs
  * with the usual LSH S-curve.
  */
object Srp {

  /** ±1 by parity of the first-8-hex-chars-of-md5 hash of "srp:p:d" —
    * the same value `CAST(concat('0x', substr(md5(...),1,8)) AS BIGINT) % 2`
    * yields in DuckDB.
    */
  def planeSign(p: Int, d: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(s"srp:$p:$d".getBytes("UTF-8"))
    val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
    if (h % 2 == 0) 1.0f else -1.0f
  }

  /** The deterministic hyperplane matrix (nPlanes × dim). Tiny (KBs) —
    * ships to executors as literals inside the plan, no broadcast needed.
    */
  def planes(nPlanes: Int, dim: Int): Array[Array[Float]] =
    Array.tabulate(nPlanes, dim)(planeSign)

  /** Per-row SRP bit signature: element p is 1 iff dot(vec, plane_p) >= 0.
    * A pure projection over the codegen'd [[graft.functions.DotProduct]] —
    * zero shuffle to produce, like every signature stage in this repo.
    */
  def srpSignatureCols(vec: Column, nPlanes: Int, dim: Int): Seq[Column] =
    planes(nPlanes, dim).toSeq.zipWithIndex.map { case (pl, p) =>
      when(graft.functions.GraftFunctions.dotProduct(vec, typedLit(pl)) >= 0.0, lit(1))
        .otherwise(lit(0)).as(s"minhash_$p")
    }

  /** SRP-LSH near-duplicate pairs: bit signatures → `numBands` band
    * buckets (REUSING [[graft.dedup.Dedup.minhashCandidatePairs]]'s
    * bounded-bucket machinery: one groupBy on (band, md5-of-band-bits),
    * bounded in-bucket collect, combination explosion — never a
    * self-join, degenerate buckets dropped whole) → exact cosine verify
    * on the candidate pairs only. The verify joins the candidate set
    * (victim-sized) back to the vector table twice by id — two
    * broadcast-able equi-joins, no vector payload through the band
    * shuffle.
    */
  def srpLshPairs(
      vectors: DataFrame,
      threshold: Double,
      nPlanes: Int = 16,
      numBands: Int = 4,
      dim: Int = 64,
      maxBucketSize: Int = 1000,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val sigs = vectors.select(
      col(idCol).as("id") +: srpSignatureCols(col(vecCol), nPlanes, dim): _*)
    val cand = graft.dedup.Dedup.minhashCandidatePairs(sigs, nPlanes, numBands, maxBucketSize)
    cand
      .join(vectors.select(col(idCol).as("id_a"), col(vecCol).as("__va")), "id_a")
      .join(vectors.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        graft.functions.Portable.r6(Similarity.cosine(col("__va"), col("__vb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
