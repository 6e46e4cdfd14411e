package graft

import graft.operators.{Graph, Merge, Scd2, Stats}
import graft.text.Novelty
import org.apache.spark.sql.functions._

/** Semantics fixtures for the round-4 additions: CDC upsert, SCD2
  * history, moment-sum statistics, triangle enumeration, and n-gram
  * novelty.
  */
class CdcStatsGraphSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------ upsert

  test("upsert replaces matched keys, appends new keys, keeps the rest") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "tag", "v")
    val updates = Seq((2L, "B", 22.0), (9L, "z", 90.0)).toDF("id", "tag", "v")
    val out = Merge.upsert(target, updates, Seq("id"))
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "a", 10.0), (2L, "B", 22.0), (3L, "c", 30.0), (9L, "z", 90.0)))
  }

  test("upsert with updates in a different column order still aligns by name") {
    val target = Seq((1L, "a", 10.0)).toDF("id", "tag", "v")
    val updates = Seq((5.0, "x", 1L)).toDF("v", "tag", "id")
    val out = Merge.upsert(target, updates, Seq("id")).as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "x", 5.0)))
  }

  test("upsert refuses updates lacking the key column") {
    val target = Seq((1L, 1.0)).toDF("id", "v")
    val updates = Seq((2L, 2.0)).toDF("other", "v")
    intercept[IllegalArgumentException] {
      Merge.upsert(target, updates, Seq("id"))
    }
  }

  // -------------------------------------------------------------------- scd2

  test("scd2 chains validity intervals per key; last version is open/current") {
    val log = Seq(
      (1L, "k", 100L, "v1"), (2L, "k", 200L, "v2"), (3L, "k", 300L, "v3"),
      (4L, "other", 150L, "w1")
    ).toDF("version_id", "key", "ts", "payload")
    val out = Scd2.history(log, Seq("key"), "ts", "version_id")
      .select(col("version_id"), col("valid_from"), col("valid_to"), col("is_current"))
      .as[(Long, Long, Option[Long], Boolean)].collect().toSet
    assert(out == Set(
      (1L, 100L, Some(200L), false),
      (2L, 200L, Some(300L), false),
      (3L, 300L, None, true),
      (4L, 150L, None, true)))
  }

  test("scd2 same-instant versions order by tie-break: earlier gets a zero-length interval") {
    val log = Seq((1L, "k", 100L), (2L, "k", 100L)).toDF("version_id", "key", "ts")
    val out = Scd2.history(log, Seq("key"), "ts", "version_id")
      .select(col("version_id"), col("valid_to"), col("is_current"))
      .as[(Long, Option[Long], Boolean)].collect().toSet
    assert(out == Set((1L, Some(100L), false), (2L, None, true)))
  }

  // ------------------------------------------------------------------- stats

  test("groupedCorrelation: exact ±1 on linear data, NULL on constant columns") {
    val df = Seq(
      ("pos", 1.0, 2.0), ("pos", 2.0, 4.0), ("pos", 3.0, 6.0),
      ("neg", 1.0, 3.0), ("neg", 2.0, 2.0), ("neg", 3.0, 1.0),
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0)
    ).toDF("g", "x", "y")
    val out = Stats.groupedCorrelation(df, Seq("g"), "x", "y")
      .as[(String, Long, Option[Double])].collect().map { case (g, n, c) => (g, (n, c)) }.toMap
    assert(out("pos")._2.exists(c => math.abs(c - 1.0) < 1e-9))
    assert(out("neg")._2.exists(c => math.abs(c + 1.0) < 1e-9))
    assert(out("flat")._2.isEmpty)
    assert(out("pos")._1 == 3L)
  }

  test("groupedCorrelation excludes NaN/NULL pairs pairwise") {
    val df = Seq(
      ("g", Some(1.0), Some(2.0)), ("g", Some(2.0), Some(4.0)),
      ("g", Some(3.0), None), ("g", None, Some(9.0)),
      ("g", Some(4.0), Some(Double.NaN))
    ).toDF("g", "x", "y")
    val out = Stats.groupedCorrelation(df, Seq("g"), "x", "y")
      .as[(String, Long, Option[Double])].collect().head
    assert(out._2 == 2L) // only the two clean pairs count
  }

  test("groupedLinReg recovers slope and intercept exactly on y = 2x + 3") {
    val df = (1 to 10).map(i => ("g", i.toDouble, 2.0 * i + 3.0)).toDF("g", "x", "y")
    val (_, n, slope, icpt) = Stats.groupedLinReg(df, Seq("g"), "x", "y")
      .as[(String, Long, Option[Double], Option[Double])].collect().head
    assert(n == 10L)
    assert(slope.exists(s => math.abs(s - 2.0) < 1e-9))
    assert(icpt.exists(b => math.abs(b - 3.0) < 1e-9))
  }

  test("groupedLinReg yields NULL slope when x is constant") {
    val df = Seq(("g", 1.0, 1.0), ("g", 1.0, 2.0)).toDF("g", "x", "y")
    val (_, _, slope, _) = Stats.groupedLinReg(df, Seq("g"), "x", "y")
      .as[(String, Long, Option[Double], Option[Double])].collect().head
    assert(slope.isEmpty)
  }

  // ---------------------------------------------------------------- triangles

  test("triangles finds each triangle once, canonically ordered") {
    // two triangles sharing edge (b,c), plus a dangling edge; input has
    // reversed duplicates and a self-loop to ignore
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"),
      ("b", "d"), ("d", "c"),
      ("c", "b"), // parallel reverse duplicate
      ("d", "d"), // self-loop
      ("d", "e") // dangling
    ).toDF("src", "dst")
    val out = Graph.triangles(edges).as[(String, String, String)].collect().toSet
    assert(out == Set(("a", "b", "c"), ("b", "c", "d")))
  }

  test("triangleCounts attributes shared-edge membership per node") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("d", "c")).toDF("src", "dst")
    val out = Graph.triangleCounts(edges).as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 1L, "b" -> 2L, "c" -> 2L, "d" -> 1L))
  }

  test("triangles on a triangle-free graph is empty") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    assert(Graph.triangles(edges).count() == 0L)
  }

  // ------------------------------------------------------------------ novelty

  test("novelty: verbatim duplicate scores 0, unique doc scores 1") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val out = Novelty.noveltyScore(docs)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(out(1L) == 0.0 && out(2L) == 0.0)
    assert(out(3L) == 1.0)
  }

  test("novelty: partial overlap scores strictly between 0 and 1") {
    val docs = Seq(
      (1L, "a b c d e f g h"), // shares the 5-gram window over a..e with doc 2
      (2L, "a b c d e x y z")
    ).toDF("doc_id", "text")
    val out = Novelty.noveltyScore(docs)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(out(1L) > 0.0 && out(1L) < 1.0)
    assert(out(2L) > 0.0 && out(2L) < 1.0)
  }
}
