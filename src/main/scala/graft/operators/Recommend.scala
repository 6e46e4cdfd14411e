package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item–item collaborative filtering over an interaction stream — the
  * classic "users who touched X also touched Y" cosine, computed from
  * exact per-(user, item) counts. The recommendation/bundling primitive,
  * and for corpus work the "which sources share an audience" coupling
  * matrix (items = sources, users = sessions).
  *
  * cos(i, j) = Σ_u c_ui·c_uj / (‖c_i‖·‖c_j‖) over the shared users.
  *
  * Scale shape: the pair generation is a self-join of per-user item
  * lists ON THE USER — the standard co-occurrence factorization that
  * never builds an item×item grid. Its skew hazard is the power user
  * touching everything (their list alone explodes quadratically), so
  * users with more than `maxItemsPerUser` distinct items are dropped
  * whole — the df-cap discipline of [[graft.dedup.Dedup]]'s bucket
  * joins; a user that touches EVERY item carries no discrimination
  * anyway (and the cap is an explicit, documented bias, not a silent
  * one: the norms are computed AFTER the cap so the cosine stays an
  * exact cosine of the capped matrix). All counts and dot products are
  * exact integers through BIGINT/DECIMAL; the one double sequence is
  * dot/(√ssa·√ssb) at the end.
  *
  * Output: (item_a, item_b, n_users, cosine), item_a < item_b, pairs
  * with at least `minUsers` shared users.
  */
object Recommend {

  def itemCosine(
      interactions: DataFrame,
      userCol: String,
      itemCol: String,
      minUsers: Long = 2L,
      maxItemsPerUser: Int = 1000): DataFrame = {
    require(minUsers >= 1, s"minUsers must be >= 1, got $minUsers")
    require(maxItemsPerUser >= 2, s"maxItemsPerUser must be >= 2, got $maxItemsPerUser")
    val counts = interactions
      .filter(col(userCol).isNotNull && col(itemCol).isNotNull)
      .groupBy(col(userCol).as("u"), col(itemCol).as("i"))
      .agg(count(lit(1)).as("c"))
    val okUsers = counts
      .groupBy("u")
      .agg(count(lit(1)).as("__ni"))
      .filter(col("__ni") <= maxItemsPerUser)
      .select("u")
    val capped = counts.join(okUsers, Seq("u"), "left_semi")
    val norms = capped
      .groupBy(col("i"))
      .agg(sum(col("c") * col("c")).as("ss"))
    val pairs = capped.as("l")
      .join(capped.as("r"), col("l.u") === col("r.u") && col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("item_a"), col("r.i").as("item_b"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("l.c") * col("r.c")).as("__dot"))
      .filter(col("n_users") >= minUsers)
    pairs
      .join(norms.select(col("i").as("item_a"), col("ss").as("__ssa")), "item_a")
      .join(norms.select(col("i").as("item_b"), col("ss").as("__ssb")), "item_b")
      .select(
        col("item_a"), col("item_b"), col("n_users"),
        (col("__dot").cast("double") /
          (sqrt(col("__ssa").cast("double")) * sqrt(col("__ssb").cast("double"))))
          .as("cosine"))
  }
}
