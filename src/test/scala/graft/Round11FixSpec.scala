package graft

import graft.operators.{Bootstrap, Fairness, Trend}
import graft.text.RetrievalEval
import org.apache.spark.sql.functions._

/** Round-11 ADVICE regressions: the three behavioral fixes from the
  * round-10 driver review, each pinned so the failure mode cannot
  * silently return.
  */
class Round11FixSpec extends SparkSpec {
  import spark.implicits._

  test("dtwDistance: empty inputs yield the 1e308 sentinel, never an ANSI index error") {
    // pre-fix: non-empty a × empty b ran sequence(1, 0) = [1, 0] and the
    // j = 0 step evaluated element_at(b, 0) -> INVALID_ARRAY_INDEX;
    // both-empty returned 0.0 against the documented sentinel
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq.empty[Double])).toDF("a", "b")
    val got = df.select(
      Trend.dtwDistance(col("a"), col("b")).as("ab"),
      Trend.dtwDistance(col("b"), col("a")).as("ba"),
      Trend.dtwDistance(col("b"), col("b")).as("bb")).collect()(0)
    assert(got.getAs[Double]("ab") == 1.0e308, "non-empty x empty -> sentinel")
    assert(got.getAs[Double]("ba") == 1.0e308, "empty x non-empty -> sentinel")
    assert(got.getAs[Double]("bb") == 1.0e308, "empty x empty -> sentinel")
  }

  test("bootstrapMedianCI: every input group surfaces, zero-weight groups with a NULL band") {
    // pre-fix: a group whose every replicate drew zero total Poisson
    // weight had no `band` row and the inner join silently DROPPED it.
    // 1-row groups draw all-zero weight with prob ~ e^-4 per group at
    // replicas = 4; over 500 deterministic groups the seeded hash
    // produces several such groups, so the NULL-band path is exercised,
    // not just reachable.
    val df = (1 to 500).map(i => (s"g$i", 7L, i.toLong)).toDF("g", "v", "id")
    val rows = Bootstrap.bootstrapMedianCI(df, Seq("g"), "v", "id", replicas = 4)
      .collect()
    assert(rows.length == 500, "no group may vanish from the report")
    val zero = rows.filter(_.getAs[Long]("k_effective") == 0L)
    assert(zero.nonEmpty, "seeded hash must exercise the all-zero-weight path")
    zero.foreach { r =>
      assert(r.getAs[Double]("median_obs") == 7.0)
      assert(r.isNullAt(r.fieldIndex("boot_lo")) && r.isNullAt(r.fieldIndex("boot_hi")),
        "k_effective = 0 -> NULL band, not a fabricated one")
    }
    rows.filter(_.getAs[Long]("k_effective") > 0L).foreach { r =>
      assert(r.getAs[Double]("boot_lo") == 7.0 && r.getAs[Double]("boot_hi") == 7.0)
    }
  }

  test("evaluateGraded: graded nDCG and cascade ERR match hand-computed values") {
    val ranking = Seq(("q", "d1", 1L), ("q", "d2", 2L), ("q", "d3", 3L))
      .toDF("query_id", "doc_id", "rank")
    // duplicate judgment for d3 (grades 1 and 2) must collapse to max=2;
    // d4 is judged-relevant but unranked (counts toward n_judged + ideal)
    val qrels = Seq(("q", "d1", 1L), ("q", "d3", 2L), ("q", "d4", 2L), ("q", "d3", 1L))
      .toDF("query_id", "id", "grade")
    val r = RetrievalEval.evaluateGraded(ranking, qrels, k = 3, maxGrade = 2)
      .collect()(0)
    assert(r.getAs[Long]("n_judged") == 3L)
    // DCG = 1/log2(2) + 0 + 3/log2(4) = 2.5;
    // IDCG (grades 2,2,1 at ideal ranks) = 3 + 3/log2(3) + 0.5 = 5.392789
    assert(math.abs(r.getAs[Double]("ndcg_graded_at_k") - 0.463582) < 1e-5)
    // ERR: R = (2^g-1)/4 -> 1/4, 0, 3/4:
    // 0.25/1 + 0 + (0.75)(1)(0.75)/3 = 0.25 + 0.1875 = 0.4375 exactly
    assert(r.getAs[Double]("err_graded_at_k") == 0.4375)
  }

  test("evaluateGraded: a query with no judged docs scores 0, not NULL") {
    val ranking = Seq(("q", "d1", 1L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(("other", "d9", 2L)).toDF("query_id", "id", "grade")
    val r = RetrievalEval.evaluateGraded(ranking, qrels, k = 3, maxGrade = 2)
      .filter(col("query_id") === "q").collect()(0)
    assert(r.getAs[Long]("n_judged") == 0L)
    assert(r.getAs[Double]("ndcg_graded_at_k") == 0.0)
    assert(r.getAs[Double]("err_graded_at_k") == 0.0)
  }

  test("gradedTermRelevance: grade counts distinct matched terms; no-match docs absent") {
    val docs = Seq(("d1", "join hash merge now"), ("d2", "join things"),
      ("d3", "nothing relevant here")).toDF("doc_id", "text")
    val got = RetrievalEval
      .gradedTermRelevance(docs, Seq("q" -> Seq("join", "hash", "merge")))
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("grade")).toMap
    assert(got == Map("d1" -> 3L, "d2" -> 1L))
  }

  test("fairnessAudit: explicit refGroup pins the reference; a misspelled one fails loudly") {
    val rows = Seq.fill(6)(("maj", true, true)) ++ Seq.fill(4)(("maj", false, false)) ++
      Seq.fill(1)(("min", true, true)) ++ Seq.fill(9)(("min", false, false))
    val df = rows.toDF("g", "sel", "y")
    val got = Fairness.fairnessAudit(df, "g", col("sel"), col("y"),
        refGroup = Some("min"))
      .collect().map(r => r.getAs[String]("group") -> r).toMap
    assert(got("min").getAs[Double]("selection_ratio") == 1.0)
    assert(math.abs(got("maj").getAs[Double]("selection_ratio") - 6.0) < 2e-6)
    // pre-fix: an unknown name made the reference frame EMPTY and the
    // crossJoin returned a zero-row report instead of an error
    val ex = intercept[Exception] {
      Fairness.fairnessAudit(df, "g", col("sel"), col("y"),
        refGroup = Some("nope")).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("not found"),
      s"expected a loud missing-reference error, got: ${ex.getMessage}")
  }
}
