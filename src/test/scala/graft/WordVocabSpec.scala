package graft

import graft.text.WordVocab

class WordVocabSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "rare word")
  ).toDF("doc_id", "text")

  test("fit ranks by count desc with word tie-break; ids start at 1") {
    val v = WordVocab.fit(docs, "text", maxSize = 3, minCount = 2L)
      .as[(String, Long, Long)].collect().toSeq
    // the×3, sat×2 keep; cat/dog/on/mat/rare/word are below minCount
    assert(v == Seq(("the", 3L, 1L), ("sat", 2L, 2L)))
  }

  test("maxSize caps the vocabulary deterministically") {
    val v = WordVocab.fit(docs, "text", maxSize = 4, minCount = 1L)
      .as[(String, Long, Long)].collect().toSeq
    // ties at n=1 resolve alphabetically: cat, dog get ids 3 and 4
    assert(v == Seq(("the", 3L, 1L), ("sat", 2L, 2L), ("cat", 1L, 3L), ("dog", 1L, 4L)))
  }

  test("encode maps OOV words to 0 and preserves positions") {
    val vocab = WordVocab.fit(docs, "text", maxSize = 2, minCount = 2L)
    val enc = WordVocab.encode(docs.filter($"doc_id" === 2L), "doc_id", "text", vocab)
      .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    // "the dog sat" -> the=1, dog=OOV 0, sat=2
    assert(enc == Seq((2L, 0L, 1L), (2L, 1L, 0L), (2L, 2L, 2L)))
  }

  test("empty corpus fits an empty vocabulary") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(WordVocab.fit(empty, "text", maxSize = 10).isEmpty)
  }
}
