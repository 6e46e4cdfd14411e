package graft

import graft.text.LineDedup

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "intro\ncookie banner\nunique body one"),
    (2L, "cookie banner\nunique body two\nfooter"),
    (3L, "cookie banner\nfooter"), // nothing unique -> doc disappears
    (4L, "  \nunique body four") // blank line dropped, body kept
  ).toDF("doc_id", "text")

  test("each distinct line survives once, at its first (doc, pos) occurrence") {
    val kept = LineDedup.keptLines(LineDedup.lineTable(docs, "doc_id", "text"))
      .as[(Long, Long, String)].collect().toSet
    assert(kept == Set(
      (1L, 0L, "intro"),
      (1L, 1L, "cookie banner"),
      (1L, 2L, "unique body one"),
      (2L, 1L, "unique body two"),
      (2L, 2L, "footer"),
      (4L, 1L, "unique body four")))
  }

  test("documents reassemble in order; fully-deduped documents disappear") {
    val out = LineDedup.dedupLines(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "intro\ncookie banner\nunique body one",
      2L -> "unique body two\nfooter",
      4L -> "unique body four"))
  }

  test("custom separator is literal, not a regex") {
    val d = Seq((1L, "a.b"), (2L, "a.c")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(d, "doc_id", "text", sep = ".")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a.b", 2L -> "c"))
  }
}
