package graft

import graft.text.Collocations

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("bigramPmi scores adjacent pairs against independence") {
    // "new york" always collocates; "the a" pair never occurs
    val docs = Seq(
      (1L, "new york new york new york"),
      (2L, "the a the b new york")
    ).toDF("id", "text")
    val out = Collocations.bigramPmi(docs, "text", minCount = 1L)
      .as[(String, String, Long, Double)].collect()
      .map { case (a, b, c, p) => (a, b) -> ((c, p)) }.toMap
    // counts: 12 token slots, 10 bigram slots; c(new)=c(york)=c(new york)=4
    val (cNY, pmiNY) = out(("new", "york"))
    assert(cNY == 4L)
    // PMI = ln(4·12·12 / (4·4·10)) = ln(3.6)
    assert(math.abs(pmiNY - math.log(3.6)) < 1e-6)
    // within-doc adjacency only: "york"/"the" cross the doc boundary
    assert(!out.contains(("york", "the")))
  }

  test("minCount prunes the noisy tail") {
    val docs = Seq((1L, "a b a b c d")).toDF("id", "text")
    val out = Collocations.bigramPmi(docs, "text", minCount = 2L)
      .as[(String, String, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(out == Set(("a", "b"))) // "b a", "b c", "c d" occur once
  }

  test("single-token and empty docs contribute no bigrams") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("id", "text")
    val out = Collocations.bigramPmi(docs, "text", minCount = 1L).collect()
    assert(out.length == 1)
  }
}
