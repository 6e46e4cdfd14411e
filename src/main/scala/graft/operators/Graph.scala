package graft.operators

import graft.plans.Materialize.PinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle enumeration over an undirected edge table — the local
  * clustering signal for link-graph curation (spam rings and template
  * farms triangulate; organic link neighborhoods mostly don't).
  *
  * Scale shape: the classic degree-ordered enumeration. Each undirected
  * edge is oriented from its lower-degree endpoint to its higher-degree
  * endpoint, which turns the graph into a DAG in which every triangle
  * has exactly ONE node with two out-edges. Wedges are then a self
  * equi-join of the oriented edges on that center node, and a triangle
  * is a wedge whose far endpoints are themselves an edge (left-semi
  * probe of the undirected edge set). Orienting by degree is what makes
  * this survive skew: a celebrity node of degree d contributes wedges
  * only through edges it RECEIVES (its own out-degree is small), so the
  * wedge count is Σ out-deg², bounded by O(E^1.5) overall instead of
  * Σ deg² — the hub never explodes a single join key. All three steps
  * are hash equi-joins; nothing is collected, no window runs without a
  * partition key.
  *
  * Self-loops and parallel edges are dropped; direction of the input is
  * ignored (a→b and b→a are the same edge).
  */
object Graph {

  /** Every triangle exactly once as (a, b, c) with a < b < c. */
  def triangles(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    // canonical undirected edge set; it feeds the degree count, the
    // orientation join, and the closing semi-join, so materialize once
    // (persist/checkpoint on a cluster — same reasoning as PageRank's
    // per-round rank frames)
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull && col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"), greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
      .pin(true)
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("d"))
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    // oriented edges lo→hi (lo = lower (degree, name)); referenced twice
    // by the wedge self-join, so materialize to evaluate the degree
    // joins once
    val oriented = und
      .join(deg.select(col("node").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("d").as("db")), "b")
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("lo"),
        when(aFirst, col("b")).otherwise(col("a")).as("hi"))
      .pin(true)
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
      .select(col("e1.lo").as("w"), col("e1.hi").as("x"), col("e2.hi").as("y"))
    wedges
      .join(und,
        least(col("x"), col("y")) === col("a") && greatest(col("x"), col("y")) === col("b"),
        "left_semi")
      .select(array_sort(array(col("w"), col("x"), col("y"))).as("t"))
      .select(col("t")(0).as("a"), col("t")(1).as("b"), col("t")(2).as("c"))
  }

  /** (node, n_triangles): how many triangles each node participates in —
    * the numerator of the local clustering coefficient. Nodes in no
    * triangle are absent.
    */
  def triangleCounts(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val t = triangles(edges, srcCol, dstCol)
    t.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
