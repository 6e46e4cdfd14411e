package graft

import graft.operators.{Assoc, Stats}
import graft.text.Importance
import org.apache.spark.sql.functions._

class AssocImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("association rules compute support/confidence/lift") {
    // 4 users: {a,b} x3, {a} x1 -> n_a=4, n_b=3, n_ab=3
    val df = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "b"), // duplicate (3,b) must not double-count
      (4L, "a")
    ).toDF("u", "i")
    val byDir = Assoc.rules(df, "u", "i", 1L).collect()
      .map(r => ((r.getAs[String]("ante"), r.getAs[String]("cons")), r)).toMap
    val ab = byDir(("a", "b"))
    assert(ab.getAs[Long]("n_both") == 3L)
    assert(math.abs(ab.getAs[Double]("support") - 0.75) < 1e-12)
    assert(math.abs(ab.getAs[Double]("confidence") - 0.75) < 1e-12)
    // lift = 3*4/(4*3) = 1
    assert(math.abs(ab.getAs[Double]("lift") - 1.0) < 1e-12)
    val ba = byDir(("b", "a"))
    assert(math.abs(ba.getAs[Double]("confidence") - 1.0) < 1e-12)
    assert(byDir.nonEmpty)
  }

  test("association rules honor minCount") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "c")).toDF("u", "i")
    val pairs = Assoc.rules(df, "u", "i", 2L).collect()
    assert(pairs.isEmpty)
  }

  test("word entropy: uniform doc maxes, repeated doc scores zero") {
    val df = Seq(
      (1L, "alpha beta gamma delta"), // 4 distinct -> H = ln 4
      (2L, "spam spam spam spam")     // one word   -> H = 0
    ).toDF("doc_id", "text")
    val h = Importance.wordEntropy(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(h(1L) - math.log(4)) < 1e-9)
    assert(math.abs(h(2L)) < 1e-9)
  }

  test("importance score ranks target-like docs above source-like") {
    val target = (1L to 20L).map(i => (i, "quality medical research findings", true))
    val noise = (21L to 40L).map(i => (i, "buy cheap pills now click here", false))
    val probe = Seq(
      (100L, "medical research quality", false),  // target-like
      (101L, "cheap pills click", false))         // source-like
    val df = (target ++ noise ++ probe).toDF("doc_id", "text", "tgt")
    val scores = Importance.importanceScore(df, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(100L) > scores(101L))
    assert(scores(100L) > 0 && scores(101L) < 0)
  }

  test("percentile rank is 0 at group min and 1 at group max") {
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 2L), ("g", 3.0, 3L), ("g", Double.NaN, 4L))
      .toDF("grp", "v", "id")
    val out = Stats.percentileRank(df, Seq("grp"), "v").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("pct")).toMap
    assert(out == Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0)) // NaN row dropped
  }
}
