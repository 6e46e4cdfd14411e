package graft

import graft.dedup.{Dedup, LshIO}
import org.apache.spark.sql.functions._

/** Persisted LSH band index: build / append / incremental dedup-against. */
class LshIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lshio").toString

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "completely different content about spark catalyst optimizer internals"),
    (3L, "a third unrelated document mentioning parquet row groups and footers")
  ).toDF("doc_id", "text")

  test("near-dup of an indexed doc is found without recomputing the corpus") {
    val dir = tmp()
    LshIO.write(corpus, dir)
    // same text as doc 1 -> identical signature -> all bands agree
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (11L, "nothing like anything stored in the index at all whatsoever")
    ).toDF("doc_id", "text")
    val out = LshIO.candidatesAgainst(batch, spark, dir)
    val rows = out.collect().map(r =>
      (r.getAs[Long]("id_new"), r.getAs[Long]("id_index"), r.getAs[Long]("n_bands_agree")))
    assert(rows.toSeq == Seq((10L, 1L, 4L)), s"got ${rows.toSeq}")
    // the candidate plan reads the PERSISTED bands — corpus text never reappears
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("bands"), "index scan present")
  }

  test("append maintains the index; degenerate buckets drop at the cap") {
    val dir = tmp()
    LshIO.write(corpus, dir)
    LshIO.append(Seq((4L, "a fourth doc appended later with its own words entirely"))
      .toDF("doc_id", "text"), dir)
    val batch = Seq((20L, "a fourth doc appended later with its own words entirely"))
      .toDF("doc_id", "text")
    val hit = LshIO.candidatesAgainst(batch, spark, dir).collect()
    assert(hit.map(_.getAs[Long]("id_index")).toSeq == Seq(4L))
    // a boilerplate family larger than the cap is dropped whole
    val boiler = (100L to 160L).map(i => (i, "identical boilerplate text shared by every page"))
      .toDF("doc_id", "text")
    val dir2 = tmp()
    LshIO.write(boiler, dir2)
    val probe = Seq((999L, "identical boilerplate text shared by every page"))
      .toDF("doc_id", "text")
    assert(LshIO.candidatesAgainst(probe, spark, dir2, maxBucketSize = 50L).count() == 0L,
      "oversized buckets are exact-dedup territory, not LSH candidates")
    assert(LshIO.candidatesAgainst(probe, spark, dir2, maxBucketSize = 100L).count() == 61L)
  }

  test("parameter manifest: probing with mismatched params errors, never wrong-answers") {
    val dir = tmp()
    LshIO.write(corpus, dir, numHashes = 16, numBands = 4, n = 3)
    assert(LshIO.readParams(spark, dir) == Some(LshIO.Params(16, 4, 3)))
    val batch = Seq((10L, "the quick brown fox jumps over the lazy dog again and again today"))
      .toDF("doc_id", "text")
    // band keys computed with different (numHashes, numBands, n) would
    // silently return empty/garbage candidates — must raise instead
    intercept[IllegalArgumentException] {
      LshIO.candidatesAgainst(batch, spark, dir, numHashes = 32, numBands = 8, n = 3)
    }
    intercept[IllegalArgumentException] {
      LshIO.candidatesAgainst(batch, spark, dir, numHashes = 16, numBands = 4, n = 5)
    }
    intercept[IllegalArgumentException] {
      LshIO.append(batch, dir, numHashes = 8, numBands = 4, n = 3)
    }
    // matching params still work
    assert(LshIO.candidatesAgainst(batch, spark, dir).count() == 1L)
  }

  test("manifest-less index fails CLOSED (crashed write / hand-rolled dir)") {
    val dir = tmp()
    LshIO.write(corpus, dir)
    // simulate a crash between the bands write and the manifest rename
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "params.json"))
    assert(LshIO.readParams(spark, dir).isEmpty)
    val batch = Seq((10L, "anything at all")).toDF("doc_id", "text")
    val ex = intercept[RuntimeException] {
      LshIO.candidatesAgainst(batch, spark, dir)
    }
    assert(ex.getMessage.contains("no params manifest"), ex.getMessage)
    intercept[RuntimeException] { LshIO.append(batch, dir) }
    // rebuilding through write() restores a probe-able index
    LshIO.write(corpus, dir)
    assert(LshIO.readParams(spark, dir) == Some(LshIO.Params(16, 4, 3)))
    assert(LshIO.candidatesAgainst(batch, spark, dir).count() == 0L)
  }

  test("stored bands match the batch banding (parity with minhashCandidatePairs)") {
    val dir = tmp()
    val dups = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "unrelated words entirely for the third document in this set")
    ).toDF("doc_id", "text")
    LshIO.write(dups, dir)
    // batch path: candidate pairs within the same frame
    val sigs = Dedup.minhashSignatures(dups, numHashes = 16, n = 3)
    val batchPairs = Dedup.minhashCandidatePairs(sigs, 16, 4)
      .as[(Long, Long)].collect().toSet
    // incremental path: doc 2 probed against an index of docs 1 and 3
    val idx = tmp()
    LshIO.write(dups.filter(col("doc_id") =!= 2L), idx)
    val inc = LshIO.candidatesAgainst(dups.filter(col("doc_id") === 2L), spark, idx)
      .select(col("id_index"), col("id_new")).as[(Long, Long)].collect().toSet
    assert(batchPairs == Set((1L, 2L)) && inc == Set((1L, 2L)))
  }
}
