package graft

import graft.dedup.Dedup
import graft.operators.{Ewma, Retention}
import java.sql.Timestamp

class EwmaContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ewma folds the recurrence in time order, seeded from the first value") {
    val df = Seq(
      (1L, ts("2024-01-01 00:02:00"), 3.0, 3L), // out of insert order on purpose
      (1L, ts("2024-01-01 00:00:00"), 1.0, 1L),
      (1L, ts("2024-01-01 00:01:00"), 2.0, 2L),
      (2L, ts("2024-01-01 00:00:00"), 7.0, 4L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = Ewma.ewmaLast(df, "user_id", "ts", "value", "event_id", 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // seed 1.0; 0.5*2+0.5*1 = 1.5; 0.5*3+0.5*1.5 = 2.25
    assert(out(1L) == (3L, 2.25))
    assert(out(2L) == (1L, 7.0)) // singleton: the value itself
  }

  test("ewma is partitioning-independent") {
    val df = (1 to 200).map(i =>
      (1L, ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), i * 1.1, i.toLong))
      .toDF("user_id", "ts", "value", "event_id")
    val a = Ewma.ewmaLast(df, "user_id", "ts", "value", "event_id", 0.3).head().getDouble(2)
    val b = Ewma.ewmaLast(df.repartition(13), "user_id", "ts", "value", "event_id", 0.3)
      .head().getDouble(2)
    assert(a == b)
  }

  test("containment flags a quote inside a long page that jaccard misses") {
    val quote = "the quick brown fox jumps over the lazy dog"
    val page = s"lorem ipsum dolor sit amet consectetur adipiscing elit $quote " +
      "sed do eiusmod tempor incididunt ut labore et dolore magna aliqua ut enim ad minim"
    val docs = Seq((1L, quote), (2L, page), (3L, "unrelated content entirely different words"))
      .toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(docs, threshold = 0.9, n = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    assert(cont.contains((1L, 2L)))
    assert(cont((1L, 2L))._1 > 0.9) // quote fully contained in page
    assert(cont((1L, 2L))._2 < 0.9) // page not contained in quote
    val jac = Dedup.ngramJaccardPairs(docs, threshold = 0.5, n = 3).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L)) // jaccard blind to it
  }

  test("group minhash similarity: identical groups ~1, disjoint groups absent") {
    val textA = "the quick brown fox jumps over the lazy dog again today"
    val textB = "entirely unrelated legal boilerplate about contracts and clauses here"
    val docs = Seq(
      (1L, textA, "s1"), (2L, textA, "s2"),   // same content, two sources
      (3L, textB, "s3")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.groupMinhashSimilarity(docs, "source", numHashes = 16, n = 3)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(out(("s1", "s2")) == 1.0) // identical shingle sets -> identical sketch
    assert(!out.contains(("s1", "s3")) && !out.contains(("s2", "s3")))
  }

  test("group minhash estimate tracks exact jaccard within sketch error") {
    // two sources sharing roughly half their content
    val shared = (1 to 30).map(i => s"shared sentence number $i about the corpus")
    val aOnly = (1 to 30).map(i => s"alpha exclusive line $i with words")
    val bOnly = (1 to 30).map(i => s"beta exclusive line $i with words")
    val docs = ((shared ++ aOnly).map(t => (t, "sa")) ++ (shared ++ bOnly).map(t => (t, "sb")))
      .zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
      .toDF("doc_id", "text", "source")
    val est = Dedup.groupMinhashSimilarity(docs, "source", numHashes = 16, n = 3)
      .head().getDouble(3)
    // exact jaccard of the two shingle sets
    val sh = Dedup.shingleHashTable(docs, "source", "text", 3)
    val sets = sh.collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val exact = sets("sa").intersect(sets("sb")).size.toDouble / sets("sa").union(sets("sb")).size
    assert(math.abs(est - exact) < 0.3, s"est $est vs exact $exact") // 16 hashes: ~1/4 std err
    assert(est > 0.1 && est < 0.9)
  }

  test("duplication stats count cross-source copies against the later holder") {
    val docs = Seq(
      (1L, "same content here", "s1"),
      (2L, "same content here", "s2"),  // dup of 1 -> victim in s2
      (3L, "unique one", "s1"),
      (4L, "same content here", "s1")   // dup of 1 -> victim in s1
    ).toDF("doc_id", "text", "source")
    val out = Dedup.duplicationStats(docs, "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("s1") == (3L, 1L))
    assert(out("s2") == (1L, 1L))
  }

  test("period-over-period computes prev bucket and relative change") {
    val day = 86400000000L
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 10:00:00")), (2L, ts("2024-01-02 11:00:00")), (3L, ts("2024-01-02 12:00:00")),
      (1L, ts("2024-01-04 10:00:00")) // gap day: no prev bucket
    ).toDF("user_id", "ts")
    val out = Retention.periodOverPeriod(df, "user_id", "ts", day)
      .orderBy("bucket").collect()
    assert(out.length == 3)
    assert(out(0).isNullAt(2) && out(0).isNullAt(3))
    assert(out(1).getLong(1) == 3L && out(1).getLong(2) == 2L)
    assert(math.abs(out(1).getDouble(3) - 0.5) < 1e-12)
    assert(out(2).isNullAt(2)) // day 4 has no day-3 predecessor
  }
}
