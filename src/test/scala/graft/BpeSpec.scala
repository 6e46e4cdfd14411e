package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "aaab" x3, "ab" x1
  //   round 1 pairs: (a,a) 3x2=6, (a,b) 3+1=4       -> merge (a,a)
  //   round 2 pairs: (aa,a) 3, (a,b) 4              -> merge (a,b)
  //   round 3 pairs: (aa,ab) 3                      -> merge (aa,ab)
  private val docs = Seq(
    (1L, "aaab aaab"), (2L, "aaab ab")
  ).toDF("doc_id", "text")

  test("fitMerges learns frequency-ordered merges with deterministic ties") {
    val merges = Bpe.fitMerges(docs, numMerges = 3)
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(merges == Seq((0L, "a", "a"), (1L, "a", "b"), (2L, "aa", "ab")))
  }

  test("fitMerges stops early when no pair remains") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.fitMerges(tiny, numMerges = 10)
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(merges == Seq((0L, "a", "b"))) // after merging "ab" no adjacency is left
  }

  test("mergeOnce replaces left-to-right greedily") {
    val out = Seq(Seq("a", "a", "a")).toDF("syms")
      .select(Bpe.mergeOnce(col("syms"), lit("a"), lit("a")).as("m"))
      .as[Seq[String]].collect().head
    assert(out == Seq("aa", "a"))
  }

  test("encode replays merges per distinct word and positions tokens") {
    val merges = Seq(("a", "a"), ("a", "b"))
    val out = Bpe.encode(Seq((7L, "aaab ab")).toDF("doc_id", "text"), merges)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out == Set(
      (7L, 0L, 0L, "aa"), (7L, 0L, 1L, "ab"), // aaab -> [aa, ab]
      (7L, 1L, 0L, "ab"))) // ab -> [ab]
  }
}
