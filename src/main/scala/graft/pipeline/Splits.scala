package graft.pipeline

import graft.text.TextFunctions.md5Hash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-proof train/val/test split assignment.
  *
  * The naive per-document hash split puts two near-duplicate documents in
  * different splits about `1 - sum(w_i^2)` of the time — which is exactly
  * the train→test contamination that inflates eval scores (the failure
  * mode the reference guards against for patients: its
  * `split_and_shard_patients` splits by SUBJECT so one person's events
  * can never straddle splits —
  * reference: src/MEDS_transforms/extract/split_and_shard_patients.py).
  * This operator generalizes that idea to any grouping: hash the GROUP
  * REPRESENTATIVE (e.g. the near-dup cluster label from
  * [[graft.dedup.Dedup.connectedComponents]]), so every member of a
  * cluster rides the same die roll.
  *
  * Scale: the clusters frame is pair-graph-sized (only docs that HAVE a
  * near-dup appear), orders of magnitude smaller than the corpus, so the
  * join broadcasts; the corpus never shuffles. The md5-derived hash is
  * the repo's portable-decision convention (any engine can replay it).
  */
object Splits {

  /** Assign each row a split name from `weights` (name → integer weight)
    * by hashing the group representative: `cluster_id` from `clusters`
    * when the row is clustered, the row's own id otherwise (a singleton
    * is its own group).
    */
  def groupAwareSplit(
      df: DataFrame,
      clusters: DataFrame,
      weights: Seq[(String, Int)],
      idCol: String = "doc_id",
      seed: String = "split"
  ): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val c = clusters.select(col("id").as("__sp_id"), col("cluster_id").as("__sp_rep"))
    val rep = coalesce(col("__sp_rep"), col(idCol).cast("long"))
    val h = pmod(md5Hash32(concat_ws("|", lit(seed), rep.cast("string"))), lit(total))
    // cumulative-weight CASE cascade: h < w1 -> s1, h < w1+w2 -> s2, ...
    val cascade = weights
      .scanLeft(("", 0)) { case ((_, acc), (name, w)) => (name, acc + w) }
      .tail
    val splitCol = cascade.init.foldRight(lit(cascade.last._1): Column) {
      case ((name, ub), rest) => when(h < ub, name).otherwise(rest)
    }
    df.join(broadcast(c), df(idCol) === col("__sp_id"), "left")
      .withColumn("split", splitCol)
      .drop("__sp_id", "__sp_rep")
  }
}
