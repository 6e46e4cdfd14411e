package graft

import graft.text.InvertedIndex

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple banana"),
    (2L, "apple banana banana banana"),
    (3L, "apple cherry"),
    (4L, "unique")
  ).toDF("id", "text")

  test("postings rank docs by tf desc with doc-id tie-break") {
    val out = InvertedIndex.postings(docs, "id", "text", k = 10)
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (t, rs) => t -> rs.sortBy(_._5).map(r => (r._3, r._4)).toSeq }
    // banana: doc 2 (tf 3) before doc 1 (tf 1)
    assert(out("banana") == Seq((2L, 3L), (1L, 1L)))
    // apple: all tf ties broken by doc id except doc1's tf 2 leads
    assert(out("apple") == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("df bounds drop hapax and stopword-grade terms; k caps lists") {
    val out = InvertedIndex.postings(docs, "id", "text", k = 1, minDf = 2, maxDf = 2)
      .as[(String, Long, Long, Long, Long)].collect()
    // apple df=3 (over), unique/cherry df=1 (under) → only banana, capped at 1
    assert(out.toSeq == Seq(("banana", 2L, 2L, 3L, 1L)))
  }

  test("df counts documents, not occurrences") {
    val df = InvertedIndex.postings(docs, "id", "text", k = 10)
      .as[(String, Long, Long, Long, Long)].collect()
      .filter(_._1 == "banana").map(_._2).distinct.toSeq
    assert(df == Seq(2L)) // 4 occurrences across 2 docs
  }
}
