package graft

import graft.operators.{Anova, Graph, Stats, Survival}
import org.apache.spark.sql.functions._

/** Round-6 third batch: one-way ANOVA F, Brown–Forsythe, log-rank test,
  * Cramér's V, degree assortativity, partition modularity.
  */
class Round6cOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- anovaF

  test("anovaF: textbook three-arm computation") {
    // arms: a={1,2,3} b={2,3,4} c={5,6,7}; grand mean 33/9
    // SSB = 3[(2-11/3)² + (3-11/3)² + (6-11/3)²] = 3(25/9+4/9+49/9) = 26
    // SSW = 2 + 2 + 2 = 6; F = (26/2)/(6/6) = 13
    val df = Seq(
      ("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 3.0),
      ("g", "b", 2.0), ("g", "b", 3.0), ("g", "b", 4.0),
      ("g", "c", 5.0), ("g", "c", 6.0), ("g", "c", 7.0)).toDF("s", "arm", "x")
    val r = Anova.anovaF(df, Seq("s"), "arm", "x").collect().head
    assert(r.getAs[Long]("n") == 9L && r.getAs[Long]("k_arms") == 3L)
    assert(math.abs(r.getAs[Double]("ss_between") - 26.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("ss_within") - 6.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("f") - 13.0) < 1e-5)
  }

  test("anovaF: degenerate slices emit NULL F, not a crash") {
    // one arm only; constant arms (ssw = 0); n == k (no within df)
    val df = Seq(
      ("one_arm", "a", 1.0), ("one_arm", "a", 2.0),
      ("const", "a", 5.0), ("const", "a", 5.0), ("const", "b", 9.0), ("const", "b", 9.0),
      ("tiny", "a", 1.0), ("tiny", "b", 2.0)).toDF("s", "arm", "x")
    val out = Anova.anovaF(df, Seq("s"), "arm", "x").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("one_arm").isNullAt(out("one_arm").fieldIndex("f")), "k < 2")
    assert(out("const").isNullAt(out("const").fieldIndex("f")), "ssw = 0")
    assert(out("tiny").isNullAt(out("tiny").fieldIndex("f")), "n = k")
    // NaN and NULL values are dropped, not poisoning the sums
    val dirty = Seq(("g", "a", 1.0), ("g", "a", Double.NaN), ("g", "b", 2.0))
      .toDF("s", "arm", "x")
    assert(Anova.anovaF(dirty, Seq("s"), "arm", "x").collect().head.getAs[Long]("n") == 2L)
  }

  // ---------------------------------------------------------- brownForsythe

  test("brownForsythe: equal spreads score ~0, unequal spreads score high") {
    // same medians, same deviations in both arms -> z identical -> F = 0
    val same = Seq.tabulate(8)(i => ("g", if (i % 2 == 0) "a" else "b", (i / 2).toDouble))
      .toDF("s", "arm", "x")
    val f0 = Anova.brownForsythe(same, Seq("s"), "arm", "x").collect().head
    assert(math.abs(f0.getAs[Double]("ss_between")) < 1e-6)
    // arm a tight around 10, arm b spread wide: deviations differ -> F > 0
    val diff = (Seq.fill(4)(("g", "a")).zip(Seq(9.0, 10.0, 10.0, 11.0)) ++
      Seq.fill(4)(("g", "b")).zip(Seq(0.0, 5.0, 15.0, 20.0)))
      .map { case ((s, a), x) => (s, a, x) }.toDF("s", "arm", "x")
    val f1 = Anova.brownForsythe(diff, Seq("s"), "arm", "x").collect().head
    assert(f1.getAs[Double]("f") > 5.0, s"spread difference must show: $f1")
  }

  // --------------------------------------------------------------- logRank

  test("logRank: identical arms give chi2 ~ 0; one-arm input gives NULL") {
    // two users per arm with the SAME event-time structure
    def u(id: Long, arm: String, purchaseDay: Int) = Seq(
      (id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "signup"),
      (id, java.sql.Timestamp.valueOf(f"2024-01-0${1 + purchaseDay}%d 00:00:00"), "purchase"))
    val ev = (u(2, "a", 1) ++ u(4, "a", 2) ++ u(1, "b", 1) ++ u(3, "b", 2))
      .toDF("user_id", "ts", "event_type")
    // arm by parity: users 2,4 in A; 1,3 in B — mirrored durations
    val r = Survival.logRank(ev, "user_id", "ts", "event_type", "purchase",
      inA = col("user_id") % 2 === 0).collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("o_a") == 2L)
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-6, s"mirrored arms: $r")
    val oneArm = Survival.logRank(ev, "user_id", "ts", "event_type", "purchase",
      inA = lit(true)).collect().head
    assert(oneArm.isNullAt(oneArm.fieldIndex("chi2")), "empty arm -> NULL chi2")
  }

  test("logRank: hand-checked two-day expectation") {
    // day 1: A-user dies, B-user dies later (day 2); both at risk day 1.
    // t=1: d=1, nA=1, n=2 -> E += 0.5, V += 1*0.5*0.5*(2-1)/(2-1) = 0.25
    // t=2: d=1, nA=0, n=1 -> E += 0, V += 0 (n = 1 guard)
    def u(id: Long, day: Int) = Seq(
      (id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "signup"),
      (id, java.sql.Timestamp.valueOf(f"2024-01-0${1 + day}%d 00:00:00"), "purchase"))
    val ev = (u(2, 1) ++ u(1, 2)).toDF("user_id", "ts", "event_type")
    val r = Survival.logRank(ev, "user_id", "ts", "event_type", "purchase",
      inA = col("user_id") % 2 === 0).collect().head
    assert(r.getAs[Long]("o_a") == 1L)
    assert(math.abs(r.getAs[Double]("e_a") - 0.5) < 1e-6)
    assert(math.abs(r.getAs[Double]("v") - 0.25) < 1e-6)
    assert(math.abs(r.getAs[Double]("chi2") - 1.0) < 1e-5) // (1-0.5)²/0.25
  }

  // -------------------------------------------------------------- cramersV

  test("cramersV: perfect association = 1, independence = 0, 1-level = NULL") {
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q")).toDF("a", "b")
    val vP = Stats.cramersV(perfect, "a", "b").collect().head
    assert(math.abs(vP.getAs[Double]("v") - 1.0) < 1e-6)
    // 2x2 uniform grid: chi2 = 0 -> v = 0
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val vI = Stats.cramersV(indep, "a", "b").collect().head
    assert(math.abs(vI.getAs[Double]("v")) < 1e-6)
    val flat = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val vF = Stats.cramersV(flat, "a", "b").collect().head
    assert(vF.isNullAt(vF.fieldIndex("v")), "min dimension 1 -> NULL")
  }

  // --------------------------------------------------------- assortativity

  test("assortativity: star is maximally disassortative, cycle is NULL") {
    val star = (1 to 4).map(i => (0, i)).toDF("src", "dst")
    val rS = Graph.assortativity(star).collect().head
    assert(rS.getAs[Long]("n_nodes") == 5L && rS.getAs[Long]("n_edges") == 4L)
    assert(rS.getAs[Double]("r") < -0.99, s"hub-leaf only: $rS")
    // cycle: every degree 2 -> zero variance -> NULL
    val cyc = Seq((1, 2), (2, 3), (3, 1)).toDF("src", "dst")
    val rC = Graph.assortativity(cyc).collect().head
    assert(rC.isNullAt(rC.fieldIndex("r")))
    // direction and duplicates are ignored
    val dup = star.unionAll(star.select(col("dst").as("src"), col("src").as("dst")))
    assert(Graph.assortativity(dup).collect().head.getAs[Long]("n_edges") == 4L)
  }

  // ------------------------------------------------------------ modularity

  test("modularity: two cliques under their own labels score high, mixed ~ 0") {
    // two triangles joined by one bridge edge; labels = the two cliques
    val e = Seq((1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)).toDF("src", "dst")
    val good = Seq((1, "l"), (2, "l"), (3, "l"), (4, "r"), (5, "r"), (6, "r"))
      .toDF("node", "label")
    val q = Graph.modularity(e, good).collect().map(r => r.getString(0) -> r).toMap
    // m = 7; each clique: lc = 3, degree mass = 7 -> q_c = 3/7 - (7/14)²
    val expected = 3.0 / 7.0 - 0.25
    assert(math.abs(q("l").getAs[Double]("q_c") - expected) < 1e-9)
    assert(math.abs(q("r").getAs[Double]("q_c") - expected) < 1e-9)
    assert(q("l").getAs[Long]("n_nodes") == 3L && q("l").getAs[Long]("n_internal") == 3L)
    // one label for everything: e_c = 1, a_c = 1 -> Q = 0 exactly
    val all = (1 to 6).map(i => (i, "z")).toDF("node", "label")
    val qAll = Graph.modularity(e, all).collect().head
    assert(math.abs(qAll.getAs[Double]("q_c")) < 1e-9)
    // unlabeled nodes keep their degree mass under NULL, never inflate others
    val partial = Seq((1, "l"), (2, "l"), (3, "l")).toDF("node", "label")
    val qP = Graph.modularity(e, partial).collect()
    assert(qP.exists(r => r.isNullAt(0)), "NULL-label row present")
    val lRow = qP.find(r => r.getString(0) == "l").get
    assert(lRow.getAs[Long]("n_internal") == 3L)
  }
}
