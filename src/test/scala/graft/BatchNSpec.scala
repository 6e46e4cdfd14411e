package graft

import graft.dedup.Dedup
import graft.text.Keywords
import org.apache.spark.sql.functions._

/** Round-8 batch N: term burstiness, duplicate-influx monitor. */
class BatchNSpec extends SparkSpec {
  import spark.implicits._

  test("termBurstiness: clumped content terms score above spread glue") {
    // "glue" appears once in every doc; "topic" appears 10x in a tenth
    // of the docs — same corpus frequency, opposite dispersion
    val docs = (1 to 100).map { i =>
      val topic = if (i % 10 == 0) " topic" * 10 else ""
      (i.toLong, s"glue filler$topic")
    }.toDF("id", "text")
    val out = Keywords.termBurstiness(docs, "id", "text", minDf = 5L)
      .collect().map(r => r.getAs[String]("term") -> r).toMap
    assert(out("glue").getAs[Long]("cf") == out("topic").getAs[Long]("cf"),
      "fixture: equal corpus frequency")
    assert(math.abs(out("glue").getAs[Double]("burstiness") - 1.0) < 1e-6)
    assert(out("topic").getAs[Double]("burstiness") == 10.0)
    assert(out("glue").getAs[Double]("vmr") < 0.1, "once-per-doc ~ no variance")
    assert(out("topic").getAs[Double]("vmr") > 5.0,
      s"clumping must inflate VMR, got ${out("topic").getAs[Double]("vmr")}")
  }

  test("termBurstiness: minDf filters the tail") {
    val docs = Seq((1L, "rare common"), (2L, "common")).toDF("id", "text")
    val terms = Keywords.termBurstiness(docs, "id", "text", minDf = 2L)
      .select("term").as[String].collect().toSet
    assert(terms == Set("common"))
  }

  test("duplicateInflux: a burst of re-fetches shows up in its bucket only") {
    // docs 0..99 unique; docs 100..149 duplicate doc 0..49's text
    val docs = ((0 until 100).map(i => (i.toLong, s"unique text number $i body")) ++
      (100 until 150).map(i => (i.toLong, s"unique text number ${i - 100} body")))
      .toDF("id", "text")
    val out = Dedup.duplicateInflux(docs, "id", "text", bucketWidth = 50L)
      .collect().map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(out(0L).getAs[Long]("n_dups") == 0L)
    assert(out(1L).getAs[Long]("n_dups") == 0L)
    assert(out(2L).getAs[Long]("n_dups") == 50L, "the re-fetch bucket must light up")
    assert(out(2L).getAs[Double]("dup_rate") == 1.0)
  }

  test("duplicateInflux: the first occurrence is never the duplicate") {
    val docs = Seq((5L, "same text"), (1L, "same text"), (9L, "other"))
      .toDF("id", "text")
    val out = Dedup.duplicateInflux(docs, "id", "text", bucketWidth = 100L)
      .collect().head
    // id 1 is first (min order), id 5 is the dup
    assert(out.getAs[Long]("n_dups") == 1L)
  }
}
