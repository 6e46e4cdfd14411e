package graft

import graft.operators.{FuzzyJoin, Graph, Rolling}
import org.apache.spark.sql.functions._

/** Round-5 batch: golden records, k-core peel, hopping windows. */
class Round5eOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- golden records

  test("goldenRecords: one canonical row per fuzzy entity, longest-name policy") {
    val df = Seq(
      (1L, "acme corp", 10.0),
      (2L, "acme corpx", 30.0), // links to 1 (dist 1)
      (3L, "acme corporation", 20.0), // too far from both at maxDist 2 -> own entity
      (4L, "zenith ltd", 5.0)
    ).toDF("id0", "name", "bal")
    val out = FuzzyJoin
      .goldenRecords(df, "id0", "name", maxDist = 2,
        extraAggs = Seq(max(col("bal")).as("max_bal")))
      .collect()
      .map(r => r.getAs[Long]("entity_id") ->
        ((r.getAs[Long]("n_members"), r.getAs[String]("canonical_name"),
          r.getAs[Double]("max_bal"), r.getAs[Long]("first_id"))))
      .toMap
    assert(out.size == 3, s"expected 3 entities: $out")
    assert(out(1L) == ((2L, "acme corpx", 30.0, 1L)),
      s"cluster {1,2}: longest name + max balance survive: $out")
    assert(out(3L)._1 == 1L && out(4L)._1 == 1L)
  }

  test("goldenRecords: identical names collapse and tie-break to the greater string") {
    val df = Seq((7L, "Same Name"), (8L, "same name"), (9L, "same namer"))
      .toDF("id0", "name")
    val out = FuzzyJoin.goldenRecords(df, "id0", "name", maxDist = 1).collect()
    assert(out.length == 1)
    // lowercased lengths: "same name" (9) vs "same namer" (10)
    assert(out(0).getAs[String]("canonical_name") == "same namer")
    assert(out(0).getAs[Long]("n_members") == 3L)
  }

  // ------------------------------------------------------------- k-core

  test("kCorePeel: a clique survives k=3, pendants and chains peel away") {
    // K4 clique a,b,c,d + tail d-e-f + pendant a-g
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("d", "e"), ("e", "f"), ("a", "g")
    ).toDF("src", "dst")
    val out = Graph.kCorePeel(edges, k = 3, rounds = 3)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("d")).toMap
    assert(out.keySet == Set("a", "b", "c", "d"), s"only the K4 survives: $out")
    assert(out.values.forall(_ == 3L), "inside the surviving core every degree is 3")
  }

  test("kCorePeel: cascading peel needs the extra rounds") {
    // chain a-b-c-d-e: k=2 kills endpoints, then the next endpoints...
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")).toDF("src", "dst")
    val r1 = Graph.kCorePeel(chain, k = 2, rounds = 1).collect().map(_.getString(0)).toSet
    val r3 = Graph.kCorePeel(chain, k = 2, rounds = 3).collect().map(_.getString(0)).toSet
    assert(r1 == Set("b", "c", "d"), s"round 1 only peels the endpoints: $r1")
    assert(r3.isEmpty, s"a chain has no 2-core once the peel cascades: $r3")
  }

  // ------------------------------------------------------ hopping windows

  test("hoppingAgg: each event lands in window/slide hops, epoch-aligned") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("x", ts("2024-01-01 00:07:00"), 2.0), // hops: 00:00 and 00:05
      ("x", ts("2024-01-01 00:12:00"), 3.0)  // hops: 00:05 and 00:10
    ).toDF("event_type", "ts", "value")
    val out = Rolling
      .hoppingAgg(ev, Seq("event_type"), "ts", "value",
        windowUs = 600000000L, slideUs = 300000000L)
      .collect()
      .map(r => r.getAs[Long]("win_start_us") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("sum_value")))).toMap
    val base = ts("2024-01-01 00:00:00").getTime * 1000L
    assert(out.size == 3)
    assert(out(base) == ((1L, 2.0)))
    assert(out(base + 300000000L) == ((2L, 5.0)), "the 00:05 window sees both events")
    assert(out(base + 600000000L) == ((1L, 3.0)))
  }

  test("hoppingAgg: NaN values count rows but not sums; window must divide evenly") {
    val ev = Seq(("x", java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), Double.NaN))
      .toDF("event_type", "ts", "value")
    val out = Rolling.hoppingAgg(ev, Seq("event_type"), "ts", "value", 600000000L, 300000000L)
      .collect()
    assert(out.forall(r => r.getAs[Long]("n") == 1L && r.getAs[Double]("sum_value") == 0.0))
    assertThrows[IllegalArgumentException] {
      Rolling.hoppingAgg(ev, Seq("event_type"), "ts", "value", 700000000L, 300000000L)
    }
  }

  // --------------------------------------------- stream-static enrichment

  test("enrichStream: dimension attributes join in per micro-batch; unmatched facts survive") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "gold"), (20L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val stream = input.toDF().toDF("user_id", "ts", "value")
    val q = graft.streaming.Streaming.enrichStream(stream, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      input.addData((10L, t0, 1.0), (99L, t0, 2.0))
      q.processAllAvailable()
      input.addData((20L, t0, 3.0))
      q.processAllAvailable()
      val out = spark.table("enriched")
        .collect().map(r => r.getAs[Long]("user_id") -> Option(r.getAs[String]("tier"))).toMap
      assert(out(10L).contains("gold") && out(20L).contains("basic"))
      assert(out(99L).isEmpty, "unmatched fact must pass through with NULL, not drop")
    } finally q.stop()
  }

  test("enrichStream batch plan broadcasts the dimension; the fact side never shuffles") {
    val dim = Seq((10L, "gold")).toDF("user_id", "tier")
    val facts = spark.range(1000).select(col("id").as("user_id"), col("id").as("v"))
    val plan = graft.streaming.Streaming.enrichStream(facts, dim, Seq("user_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact side must not shuffle:\n$plan")
  }
}
