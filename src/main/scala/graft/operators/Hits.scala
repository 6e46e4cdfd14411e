package graft.operators

import graft.plans.Materialize.PinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities over a directed edge table — the
  * complement of [[PageRank]] for link-graph curation: PageRank scores
  * global endorsement, HITS separates "points at good pages" (hub) from
  * "is pointed at by good hubs" (authority), which is the directory-
  * page-vs-content-page split a web-corpus quality prior wants.
  *
  * Same execution discipline as [[PageRank.pageRank]]: parallel edges
  * collapse to WEIGHTED edges once (pinned), per round one join+groupBy
  * per direction over node-sized score frames, eager checkpoints keep
  * the loop's lineage flat. Scores are L1-normalized each half-step
  * (Σ = 1) with the normalizer taken as a one-row broadcast — the
  * classic L2 norm would put a libm sqrt inside the iteration, while
  * Σ-normalization keeps every round's arithmetic in the exact
  * DECIMAL product + portable double division the oracle can replicate.
  *
  * Mass products use the (27,12)×(10,0) exact-decimal trick from
  * PageRank so partial-aggregation order cannot wiggle low bits.
  */
object Hits {

  /** `iters` full rounds (auth update then hub update) starting from
    * all-ones. Output: (node, auth, hub) for every node appearing as
    * src or dst; nodes with no in-edges carry auth 0, no out-edges hub 0.
    */
  def hits(
      edges: DataFrame,
      iters: Int,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .pin(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .pin(true)

    // one half-step: new score(outKey) = Σ_edges w · prev(inKey),
    // L1-normalized. inKey/outKey swap between the auth and hub halves.
    def halfStep(prev: DataFrame, inKey: String, outKey: String): DataFrame = {
      val mass = e
        .join(prev, e(inKey) === prev("node"))
        .select(
          col(outKey).as("node"),
          (col("score").cast("decimal(27,12)") * col("w").cast("decimal(10,0)")).as("__m"))
        .groupBy("node")
        .agg(sum(col("__m")).as("__m"))
      val total = mass.agg(sum(col("__m")).as("__tot"))
      nodes
        .join(mass, Seq("node"), "left")
        .crossJoin(broadcast(total))
        .select(
          col("node"),
          when(col("__tot").isNotNull && col("__tot") =!= 0,
            coalesce(col("__m"), lit(0)).cast("double") / col("__tot").cast("double"))
            .otherwise(lit(0.0)).as("score"))
        .pin(true)
    }

    var hubs = nodes.select(col("node"), lit(1.0).as("score"))
    var auths = hubs
    for (_ <- 1 to iters) {
      auths = halfStep(hubs, inKey = "src", outKey = "dst")
      hubs = halfStep(auths, inKey = "dst", outKey = "src")
    }
    nodes
      .join(auths.withColumnRenamed("score", "auth"), Seq("node"), "left")
      .join(hubs.withColumnRenamed("score", "hub"), Seq("node"), "left")
  }
}
