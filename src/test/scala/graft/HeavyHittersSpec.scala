package graft

import graft.functions.FrequentItems.frequentItems
import graft.operators.{Compact, HeavyHitters, PageRank}
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MG sketch never misses an item above the N/(k+1) bound, at any partitioning") {
    // N = 60: 'a' x25, 'b' x20, c..j x ~2 each; k=3 -> bound 15
    val items = (Seq.fill(25)("a") ++ Seq.fill(20)("b") ++
      (1 to 15).map(i => s"c${i % 8}"))
    for (parts <- Seq(1, 3, 7)) {
      val cand = spark.sparkContext.parallelize(items, parts).toDF("x")
        .agg(frequentItems(col("x"), 3).as("c"))
        .select(explode(col("c")).as("c")).select("c.item").as[String].collect().toSet
      assert(Set("a", "b").subsetOf(cand), s"parts=$parts lost a heavy hitter: $cand")
    }
  }

  test("sketch weights are lower bounds on the true count") {
    val items = Seq.fill(30)("hot") ++ (1 to 40).map(i => s"cold$i")
    val got = Seq(items).toDF("xs").select(explode(col("xs")).as("x"))
      .repartition(4)
      .agg(frequentItems(col("x"), 5).as("c"))
      .select(explode(col("c")).as("c")).select("c.item", "c.weight")
      .as[(String, Long)].collect().toMap
    assert(got.contains("hot") && got("hot") <= 30)
  }

  test("sketch buffers round-trip items past the 64KB writeUTF limit") {
    val big = "x" * 70000 // would throw UTFDataFormatException under writeUTF
    val items = Seq.fill(6)(big) ++ Seq("small")
    val cand = items.toDF("x").repartition(3)
      .agg(frequentItems(col("x"), 2).as("c"))
      .select(explode(col("c")).as("c")).select("c.item").as[String].collect()
    assert(cand.contains(big))
  }

  test("exactHeavyHitters returns exact counts and only items over the threshold") {
    val items = Seq.fill(12)("x") ++ Seq.fill(9)("y") ++ Seq.fill(3)("z")
    val out = HeavyHitters.exactHeavyHitters(
      items.toDF("tok").repartition(3), "tok", k = 10, threshold = 9L)
      .as[(String, Long)].collect().toMap
    assert(out == Map("x" -> 12L, "y" -> 9L))
  }

  test("exactHeavyHitters fails loudly when the threshold is under the miss bound") {
    val items = (1 to 100).map(i => s"t${i % 20}")
    val ex = intercept[Exception] {
      HeavyHitters.exactHeavyHitters(items.toDF("tok"), "tok", k = 4, threshold = 10L)
        .collect() // 10 * 5 <= 100 -> guarantee void
    }
    assert(ex.getMessage.contains("raise k") || ex.getCause != null)
  }

  test("latestPerKey keeps the greatest (order, tie) row per key, nulls losing") {
    val log = Seq(
      (1L, "a", 10L, Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")), 1.0),
      (1L, "a", 11L, Some(java.sql.Timestamp.valueOf("2024-01-01 12:00:00")), 2.0),
      (1L, "a", 12L, None, 9.0), // null ts ranks lowest
      (2L, "b", 20L, Some(java.sql.Timestamp.valueOf("2024-01-01 09:00:00")), 3.0),
      (2L, "b", 21L, Some(java.sql.Timestamp.valueOf("2024-01-01 09:00:00")), 4.0) // ts tie -> higher id wins
    ).toDF("user_id", "event_type", "event_id", "ts", "value")
    val out = Compact.latestPerKey(log, Seq("user_id", "event_type"), Seq("ts", "event_id"))
      .select("user_id", "event_type", "event_id", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(out == Set((1L, "a", 11L, 2.0), (2L, "b", 21L, 4.0)))
  }

  test("pageRank matches the hand-computed two-node exchange") {
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    // a -> b, b -> a: symmetric, every rank stays 1.0 at every iteration
    val sym = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = PageRank.pageRank(sym, iters = 4).as[(String, Double)].collect().toMap
    assert(close(r("a"), 1.0) && close(r("b"), 1.0))
    // star: a,b,c all point at hub; hub dangles (keeps teleport mass only)
    val star = Seq(("a", "hub"), ("b", "hub"), ("c", "hub")).toDF("src", "dst")
    val s = PageRank.pageRank(star, iters = 1).as[(String, Double)].collect().toMap
    assert(close(s("hub"), 0.15 + 0.85 * 3.0))
    assert(close(s("a"), 0.15))
  }
}
