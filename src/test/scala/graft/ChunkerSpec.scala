package graft

import graft.text.Chunker

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("chunks overlap by the configured amount and cover every token") {
    // 7 tokens, window 4, overlap 2 -> stride 2 -> chunks at 1,3,5(..7)
    val docs = Seq((1L, "a b c d e f g")).toDF("id", "text")
    val out = Chunker.chunkByTokens(docs, "id", "text", chunkTokens = 4, overlapTokens = 2)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2).toSeq
    assert(out == Seq(
      (1L, 0L, "a b c d", 4L),
      (1L, 1L, "c d e f", 4L),
      (1L, 2L, "e f g", 3L)))
  }

  test("short docs yield one whole chunk; empty docs none") {
    val docs = Seq((1L, "x y"), (2L, ""), (3L, "???")).toDF("id", "text")
    val out = Chunker.chunkByTokens(docs, "id", "text", chunkTokens = 10)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, "x y", 2L)))
  }

  test("zero-overlap chunks partition the token stream exactly") {
    val words = ('a' to 'j').map(c => s"$c$c")
    val docs = Seq((1L, words.mkString(" "))).toDF("id", "text")
    val out = Chunker.chunkByTokens(docs, "id", "text", chunkTokens = 4, overlapTokens = 0)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(out.map(_._4).sum == 10L)
    assert(out.map(_._3).mkString(" ") == words.mkString(" "))
  }

  test("invalid overlap is rejected") {
    val docs = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Chunker.chunkByTokens(docs, "id", "text", chunkTokens = 4, overlapTokens = 4)
    }
  }
}
