package graft

import graft.operators.{Stats, Transitions, Trending}
import graft.pipeline.Selection
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TrendingSelectionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val day = 86400000000L

  test("trending keeps exactly k items per bucket, count-desc, item tiebreak") {
    val rows = Seq.fill(3)((ts("2024-01-01 10:00:00"), "a")) ++
      Seq.fill(2)((ts("2024-01-01 11:00:00"), "b")) ++
      Seq.fill(2)((ts("2024-01-01 12:00:00"), "c")) ++   // tie with b -> b first
      Seq.fill(1)((ts("2024-01-01 13:00:00"), "d")) ++
      Seq.fill(5)((ts("2024-01-02 10:00:00"), "d"))
    val out = Trending.topItemsPerBucket(rows.toDF("ts", "item"), "ts", "item", day, 2)
      .orderBy("bucket", "rnk").collect()
      .map(r => (r.getAs[String]("item"), r.getAs[Long]("n"), r.getAs[Int]("rnk")))
    assert(out.toSeq == Seq(("a", 3L, 1), ("b", 2L, 2), ("d", 5L, 1)))
  }

  test("gini: even spread ~ 0, total concentration -> (n-1)/n") {
    val even = Seq.fill(10)(("g", 5.0)).toDF("grp", "v")
    val g1 = Stats.gini(even, Seq("grp"), "v").head().getDouble(2)
    assert(math.abs(g1) < 1e-9)
    val conc = (("g", 100.0) +: Seq.fill(9)(("g", 0.0))).toDF("grp", "v")
    val g2 = Stats.gini(conc, Seq("grp"), "v").head().getDouble(2)
    assert(math.abs(g2 - 0.9) < 1e-9)
    // zero-mass group -> NULL
    val zero = Seq(("z", 0.0)).toDF("grp", "v")
    assert(Stats.gini(zero, Seq("grp"), "v").head().isNullAt(2))
  }

  test("budget selection keeps the best prefix within budget per group") {
    val df = Seq(
      ("s1", 1L, 0.9, 40L), ("s1", 2L, 0.8, 40L), ("s1", 3L, 0.7, 40L), // 3rd overflows
      ("s2", 4L, 0.1, 10L)
    ).toDF("src", "id", "score", "cost")
    val kept = Selection.selectUnderBudget(df, Seq("src"), "score", "cost", 100L, "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L))
  }

  test("transition matrix counts successors in time order with cond. probs") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a", 1L),
      (1L, ts("2024-01-01 00:01:00"), "b", 2L),
      (1L, ts("2024-01-01 00:02:00"), "a", 3L),
      (2L, ts("2024-01-01 00:00:00"), "a", 4L),
      (2L, ts("2024-01-01 00:01:00"), "b", 5L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Transitions.transitionCounts(df, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("a", "b")) == (2L, 1.0))   // a always hands to b
    assert(out(("b", "a"))._1 == 1L)        // only user 1's b->a
    assert(math.abs(out(("b", "a"))._2 - 1.0) < 1e-12) // b's only observed successor
    assert(!out.contains(("a", "a")))
  }
}
