package graft

import graft.operators.Diff
import org.apache.spark.sql.functions._

class DiffSpec extends SparkSpec {
  import spark.implicits._

  private val fp = md5(concat_ws("|", col("a"), col("b")))

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "x", 1L), (2L, "y", 2L), (3L, "z", 3L)).toDF("k", "a", "b")
    val neu = Seq((2L, "y", 2L), (3L, "Z", 3L), (4L, "w", 4L)).toDF("k", "a", "b")
    val out = Diff.snapshotDiff(old, neu, Seq("k"), fp)
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("identical snapshots diff to empty") {
    val d = Seq((1L, "x", 1L)).toDF("k", "a", "b")
    assert(Diff.snapshotDiff(d, d, Seq("k"), fp).isEmpty)
  }

  test("composite keys are supported") {
    val old = Seq((1L, 1L, "x", 0L)).toDF("k1", "k2", "a", "b")
    val neu = Seq((1L, 2L, "x", 0L)).toDF("k1", "k2", "a", "b")
    val out = Diff.snapshotDiff(old, neu, Seq("k1", "k2"), fp)
      .as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 1L, "removed"), (1L, 2L, "added")))
  }

  test("a NULL fingerprint on a present row is not mistaken for absence") {
    val fpNullable = md5(col("a")) // null payload -> null fingerprint
    val old = Seq((1L, Option.empty[String]), (2L, Option("x"))).toDF("k", "a")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "a")
    val out = Diff.snapshotDiff(old, neu, Seq("k"), fpNullable)
      .as[(Long, String)].collect().toSet
    // k=1: present in both with null fp on both sides -> unchanged, not added
    // k=2: fp x -> null is a real change
    assert(out == Set((2L, "changed")))
  }

  test("null keys never match: they surface as removed+added, not changed") {
    val old = Seq((Option.empty[Long], "x", 1L)).toDF("k", "a", "b")
    val neu = Seq((Option.empty[Long], "x", 1L)).toDF("k", "a", "b")
    val out = Diff.snapshotDiff(old, neu, Seq("k"), fp)
      .select("status").as[String].collect().sorted.toSeq
    assert(out == Seq("added", "removed"))
  }
}
