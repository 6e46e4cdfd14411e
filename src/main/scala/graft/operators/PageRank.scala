package graft.operators

import graft.plans.Materialize.PinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative PageRank over an edge table — the link-graph scorer a
  * web-corpus curation pipeline uses for document authority (domain
  * ranks feeding quality priors). Pure DataFrame iteration, the same
  * execution shape as [[graft.dedup.Dedup]]'s label propagation:
  *
  *   per round: ranks ⋈ edges on src (one shuffle on src — or zero when
  *   both sides are pre-partitioned on src), groupBy dst (one shuffle on
  *   dst), then a left join back onto the node table for dangling nodes.
  *   Rank frames are node-sized (≪ edges) and eagerly checkpointed so
  *   the loop's lineage stays flat.
  *
  * Semantics: standard damped PageRank with UNIFORM (1−d) teleport mass
  * per node. Dangling nodes (no out-edges) keep only teleport mass —
  * their rank is not redistributed (the common simplification; the
  * redistribution variant adds one scalar agg per round). Deterministic
  * up to double-summation order; contributions are summed in
  * DECIMAL(38,12) so partial-aggregation order cannot wiggle the low
  * bits and the result is engine-portable at round(6).
  */
object PageRank {

  /** `iters` rounds over `edges` (srcCol, dstCol; parallel edges count
    * multiply). Output: (node, rank) for every node appearing as src or
    * dst. `d` is the damping factor.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      d: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(d >= 0 && d <= 1, s"damping must be in [0,1], got $d")
    // collapse parallel edges to WEIGHTED edges once, then pin: the
    // iteration cost becomes O(distinct (src,dst)) instead of O(raw
    // edges) — on dense multigraphs (word adjacency, clickstreams) that
    // is orders less work per round, and w * round(rank/deg, 12) is
    // bit-identical to decimal-summing rank/deg once per parallel edge,
    // so the semantics (parallel edges count multiply) are unchanged.
    // One corpus-sized groupBy replaces the raw-edge materialization.
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .pin(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .pin(true)
    val outDeg = e.groupBy("src").agg(sum(col("w")).as("deg")).pin(true)
    var ranks = nodes.select(col("node"), lit(1.0).as("rank"))
    for (_ <- 0 until iters) {
      val contrib = e
        .join(ranks, e("src") === ranks("node"))
        .join(outDeg, "src")
        .select(col("dst").as("node"),
          // (27,12) x (10,0) -> decimal(38,12) EXACT. A bare bigint w
          // would push the product past precision 38 and Spark silently
          // reduces the scale (rounds) — measured 1e-6 drift vs the
          // per-parallel-edge sum this must replicate bit-for-bit.
          ((col("rank") / col("deg")).cast("decimal(27,12)") *
            col("w").cast("decimal(10,0)")).as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("in_mass"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - d) + lit(d) * coalesce(col("in_mass").cast("double"), lit(0.0))).as("rank"))
        .pin(true)
    }
    ranks
  }

  /** Personalized PageRank: teleport mass goes ONLY to the `seeds` node
    * set, so rank measures proximity to the seeds through the link
    * structure — the related-entity / topic-neighborhood retrieval
    * variant ("PageRank from the perspective of these nodes"). Seeds
    * follow [[pageRank]]'s uniform-mass-per-node convention (each seed
    * gets (1−d), non-seeds 0); nodes unreachable from the seed set
    * finish at exactly 0 and are the caller's "unrelated" class.
    *
    * Identical execution shape to [[pageRank]] — weighted edges, one
    * join+groupBy per round over node-sized frames, exact decimal
    * products, pinned iteration; the seed flag is one extra node-sized
    * left join folded into the node table BEFORE the loop.
    */
  def personalizedPageRank(
      edges: DataFrame,
      seeds: DataFrame,
      iters: Int,
      d: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst",
      seedCol: String = "node"
  ): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(d >= 0 && d <= 1, s"damping must be in [0,1], got $d")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .pin(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .join(seeds.select(col(seedCol).as("node")).distinct()
        .withColumn("__seed", lit(1.0)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(0.0)).as("seed"))
      .pin(true)
    val outDeg = e.groupBy("src").agg(sum(col("w")).as("deg")).pin(true)
    var ranks = nodes.select(col("node"), (lit(1.0) * col("seed")).as("rank"))
    for (_ <- 0 until iters) {
      val contrib = e
        .join(ranks, e("src") === ranks("node"))
        .join(outDeg, "src")
        .select(col("dst").as("node"),
          ((col("rank") / col("deg")).cast("decimal(27,12)") *
            col("w").cast("decimal(10,0)")).as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("in_mass"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - d) * col("seed") +
            lit(d) * coalesce(col("in_mass").cast("double"), lit(0.0))).as("rank"))
        .pin(true)
    }
    ranks
  }
}
