package graft

import graft.operators.Graph
import graft.pipeline.Selection
import graft.text.QueryLikelihood
import org.apache.spark.sql.functions._

/** Round-8 batch C: Dirichlet query likelihood, MMR diverse selection,
  * LPA community detection.
  */
class Round8cOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- query likelihood

  private val tinyCorpus = Seq(
    (1L, "a a b"),
    (2L, "b c"),
    (3L, "a b c d e f g h i j k l m n o p")
  ).toDF("doc_id", "text")

  test("queryLikelihood: hand-computed Dirichlet score") {
    val mu = 10.0
    val out = QueryLikelihood.retrieveTopK(tinyCorpus, Seq("q" -> Seq("a")), k = 10, mu = mu)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("qlm")).toMap
    // C = 3 + 2 + 16 = 21 tokens; cf(a) = 3
    val c = 21.0
    def score(tf: Double, dl: Double): Double = {
      val matched = math.floor(math.log(1.0 + tf * c / (mu * 3.0)) * 1e6 + 0.5) / 1e6
      math.floor((matched + 1.0 * math.log(mu / (dl + mu))) * 1e6 + 0.5) / 1e6
    }
    assert(math.abs(out(1L) - score(2.0, 3.0)) < 1e-9, s"d1: ${out(1L)} vs ${score(2.0, 3.0)}")
    assert(math.abs(out(3L) - score(1.0, 16.0)) < 1e-9)
    // d2 has no query term -> not a candidate
    assert(!out.contains(2L))
  }

  test("queryLikelihood: higher tf wins at equal length; longer doc penalized at equal tf") {
    val docs = Seq(
      (1L, "x y z w"), (2L, "x x y z"),
      (3L, "x a b c d e f g h i j k l m n o")
    ).toDF("doc_id", "text")
    val r = QueryLikelihood.retrieveTopK(docs, Seq("q" -> Seq("x")), k = 3)
      .collect().map(x => x.getAs[Long]("rank") -> x.getAs[Long]("id")).toMap
    assert(r(1L) == 2L, "tf=2 must outrank tf=1 at the same length")
    assert(r(2L) == 1L && r(3L) == 3L, "longer doc must rank below the short one at tf=1")
  }

  test("queryLikelihood: collection-absent query terms are dropped from |q|") {
    val base = QueryLikelihood.retrieveTopK(tinyCorpus, Seq("q" -> Seq("a")), k = 10)
      .select("id", "qlm").as[(Long, Double)].collect().toMap
    val extra = QueryLikelihood.retrieveTopK(tinyCorpus, Seq("q" -> Seq("a", "zzzz")), k = 10)
      .select("id", "qlm").as[(Long, Double)].collect().toMap
    assert(base == extra, "an unseen term must not shift any score (its smoothed p is 0)")
  }

  // ------------------------------------------------------------- MMR

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("mmrSelect: lambda=1 is plain top-k by relevance") {
    val cand = Seq(("q", 1L, 0.9), ("q", 2L, 0.8), ("q", 3L, 0.7)).toDF("query", "id", "rel")
    val vecs = Seq((1L, vec(1, 0)), (2L, vec(1, 0)), (3L, vec(0, 1))).toDF("id", "embedding")
    val out = Selection.mmrSelect(cand, vecs, "query", "id", "rel", k = 3, lambda = 1.0)
      .orderBy("step").select("id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("mmrSelect: moderate lambda skips the near-duplicate of the first pick") {
    // ids 1 and 2 are identical vectors; 3 is orthogonal with lower rel
    val cand = Seq(("q", 1L, 0.9), ("q", 2L, 0.89), ("q", 3L, 0.5)).toDF("query", "id", "rel")
    val vecs = Seq((1L, vec(1, 0)), (2L, vec(1, 0)), (3L, vec(0, 1))).toDF("id", "embedding")
    val out = Selection.mmrSelect(cand, vecs, "query", "id", "rel", k = 2, lambda = 0.5)
      .orderBy("step").collect()
    assert(out(0).getAs[Long]("id") == 1L)
    // step 2: score(2) = .5*.89 - .5*1 = -0.055 < score(3) = .5*.5 - .5*0 = 0.25
    assert(out(1).getAs[Long]("id") == 3L, "the near-dup must lose to the diverse candidate")
    assert(out(1).getAs[Double]("max_sim") == 0.0)
  }

  test("mmrSelect: queries with fewer candidates than k stop early") {
    val cand = Seq(("q", 1L, 0.9), ("q", 2L, 0.8)).toDF("query", "id", "rel")
    val vecs = Seq((1L, vec(1, 0)), (2L, vec(0, 1))).toDF("id", "embedding")
    val out = Selection.mmrSelect(cand, vecs, "query", "id", "rel", k = 5, lambda = 0.7)
    assert(out.count() == 2)
  }

  test("mmrSelect: over-cap candidate sets fail loudly") {
    val cand = (1 to 70).map(i => ("q", i.toLong, 1.0 / i)).toDF("query", "id", "rel")
    val vecs = (1 to 70).map(i => (i.toLong, vec(1, 0))).toDF("id", "embedding")
    val e = intercept[Exception] {
      Selection.mmrSelect(cand, vecs, "query", "id", "rel", k = 2, lambda = 0.7).collect()
    }
    assert(e.getMessage.contains("maxCandidates"), e.getMessage)
  }

  // ------------------------------------------------------------- LPA

  test("labelPropagation: two cliques with one bridge resolve to two communities") {
    val cliqueA = for (i <- 1 to 5; j <- (i + 1) to 5) yield (s"a$i", s"a$j")
    val cliqueB = for (i <- 1 to 5; j <- (i + 1) to 5) yield (s"b$i", s"b$j")
    val edges = (cliqueA ++ cliqueB :+ ("a1", "b1")).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, iterations = 3)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[String]("community")).toMap
    val aLabels = (1 to 5).map(i => out(s"a$i")).toSet
    val bLabels = (1 to 5).map(i => out(s"b$i")).toSet
    assert(aLabels.size == 1, s"clique A must agree on one label, got $aLabels")
    assert(bLabels.size == 1, s"clique B must agree on one label, got $bLabels")
    assert(aLabels != bLabels, "the bridge must not merge the cliques")
  }

  test("labelPropagation: deterministic under repartitioning") {
    val edges = (for (i <- 1 to 20) yield (s"n${i % 7}", s"n${(i * 3) % 7}")).toDF("src", "dst")
    val a = Graph.labelPropagation(edges.repartition(1), 3).collect().toSet
    val b = Graph.labelPropagation(edges.repartition(8), 3).collect().toSet
    assert(a == b)
  }

  test("labelPropagation: iteration bound is a loud contract") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(edges, iterations = 99)
    }
  }

  test("communitySizes: filters below minSize and reports the min member") {
    val cliqueA = for (i <- 1 to 5; j <- (i + 1) to 5) yield (s"a$i", s"a$j")
    val edges = (cliqueA :+ ("x1", "x2")).toDF("src", "dst")
    val out = Graph.communitySizes(edges, iterations = 3, minSize = 3)
    val rows = out.collect()
    assert(rows.length == 1, s"only the 5-clique passes minSize=3: ${rows.mkString(",")}")
    assert(rows.head.getAs[Long]("n_nodes") == 5)
    assert(rows.head.getAs[String]("min_member") == "a1")
  }
}
