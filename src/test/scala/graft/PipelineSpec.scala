package graft

import graft.pipeline.{Packing, Sampling, Selection}
import graft.text.Tfidf
import org.apache.spark.sql.functions._

/** Semantics fixtures for the sampling / selection / packing / tf-idf
  * pipeline operators.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 1000L)
    .map(i => (i, if (i % 2 == 0) "en" else "de"))
    .toDF("doc_id", "lang")

  test("deterministicSample is stable, id-keyed, and close to the target fraction") {
    val s1 = Sampling.deterministicSample(docs, "doc_id", 0.3, "seed1")
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(docs, "doc_id", 0.3, "seed1")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "same seed must select the same rows")
    assert(math.abs(s1.size - 300) < 60, s"sample size ${s1.size} far from 300")
    // a different seed decorrelates membership
    val s3 = Sampling.deterministicSample(docs, "doc_id", 0.3, "seed2")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 != s3)
    // growing the fraction only ADDS rows (thresholds nest)
    val s4 = Sampling.deterministicSample(docs, "doc_id", 0.5, "seed1")
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s4), "frac=0.3 sample must nest inside frac=0.5")
  }

  test("deterministicNPerGroup caps every group at n, stable under repartitioning") {
    val out = Sampling.deterministicNPerGroup(docs, "doc_id", "lang", 5, "seed1")
    val perGroup = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup.values.forall(_ <= 5))
    val again = Sampling
      .deterministicNPerGroup(docs.repartition(13), "doc_id", "lang", 5, "seed1")
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("deterministicSampleN returns exactly n stable rows via TakeOrderedAndProject") {
    val out = Sampling.deterministicSampleN(docs, "doc_id", 50, "seed1")
    assert(out.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "fixed-size sample must not global-sort")
    val s1 = out.select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.deterministicSampleN(docs.repartition(13), "doc_id", 50, "seed1")
      .select("doc_id").as[Long].collect().toSet
    assert(s1.size == 50 && s1 == s2, "sample must be exact-size and partitioning-independent")
  }

  test("stratifiedSample applies per-stratum fractions") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
      fracs = Map("en" -> 1.0, "de" -> 0.0), defaultFrac = 0.5)
    val langs = out.select("lang").as[String].collect()
    assert(langs.forall(_ == "en") && langs.length == 500)
  }

  test("topKPerGroup ranks within each group with deterministic ties") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 5.0),
      ("b", 5L, 1.0)
    ).toDF("g", "id", "score")
    val out = Selection.topKPerGroup(df, Seq("g"), "score", k = 2, tieBreakCol = "id")
      .select("g", "id", "rank").as[(String, Long, Long)].collect().toSet
    assert(out == Set(("a", 2L, 1L), ("a", 3L, 2L), ("b", 5L, 1L)))
  }

  test("packByTokenBudget: bins respect prefix-sum boundaries with bounded overflow") {
    val df = Seq((1L, 900L), (2L, 900L), (3L, 900L), (4L, 50L), (5L, 3000L))
      .toDF("doc_id", "ntok")
    val out = Packing.packByTokenBudget(df, "doc_id", "ntok", budgetTokens = 2000, nShards = 1)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // prefix sums before each doc: 0, 900, 1800, 2700, 2750
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L))
    // per-bin totals never exceed budget + the largest straddling doc
    val totals = Packing.packByTokenBudget(df, "doc_id", "ntok", 2000, 1)
      .groupBy("bin").agg(sum("ntok").as("t")).select("t").as[Long].collect()
    assert(totals.forall(_ <= 2000 + 3000))
  }

  test("materializePacks concatenates bin members in id order with the separator") {
    val df = Seq((1L, "aa", 900L), (2L, "bb", 900L), (3L, "cc", 900L))
      .toDF("doc_id", "text", "ntok")
    val out = Packing.materializePacks(df, "doc_id", "text", "ntok", 2000, nShards = 1, separator = "|")
      .orderBy("bin").as[(Long, Long, Seq[Long], String, Long)].collect()
    // prefix sums 0,900,1800 -> docs 1,2,3 all bin 0? 1800/2000=0 -> yes all bin 0
    assert(out.length == 1)
    assert(out(0)._3 == Seq(1L, 2L, 3L) && out(0)._4 == "aa|bb|cc" && out(0)._5 == 2700L)
  }

  test("packByTokenBudget: zero-token documents still advance bins (no unbounded bin)") {
    // 5000 zero-token docs in one shard: without the >=1 clamp they all
    // share bin 0 and the materialize collect is unbounded
    val df = (1L to 5000L).map(i => (i, 0L)).toDF("doc_id", "ntok")
    val sizes = Packing.packByTokenBudget(df, "doc_id", "ntok", budgetTokens = 100, nShards = 1)
      .groupBy("bin").count().select("count").as[Long].collect()
    assert(sizes.forall(_ <= 100), s"bin sizes must be capped by the budget, got max ${sizes.max}")
    assert(sizes.length == 50)
  }

  test("packByTokenBudget shards deterministically and bins independently per shard") {
    val df = (1L to 200L).map(i => (i, 100L)).toDF("doc_id", "ntok")
    val a = Packing.packByTokenBudget(df, "doc_id", "ntok", 500, nShards = 4)
      .select("doc_id", "shard", "bin").as[(Long, Long, Long)].collect().toSet
    val b = Packing.packByTokenBudget(df.repartition(7), "doc_id", "ntok", 500, nShards = 4)
      .select("doc_id", "shard", "bin").as[(Long, Long, Long)].collect().toSet
    assert(a == b, "pack assignment must not depend on input partitioning")
    assert(a.size == 200 && a.map(_._2).size <= 4)
  }

  test("bm25: more matching terms rank higher; non-matching docs absent; tf saturates") {
    val df = Seq(
      (1L, "spark hash merge join"),       // all 3 query terms
      (2L, "spark spark spark spark spark filler filler filler"), // 1 term repeated
      (3L, "spark hash other"),            // 2 terms
      (4L, "nothing relevant here")
    ).toDF("doc_id", "text")
    val out = graft.text.Bm25.score(df, Seq("spark", "hash", "merge"))
      .as[(Long, Double)].collect().toMap
    assert(!out.contains(4L), "doc without query terms must be absent")
    assert(out(1L) > out(3L) && out(3L) > 0)
    // saturation: 5x tf of one term scores below 3 distinct terms
    assert(out(2L) < out(1L))
    val top = graft.text.Bm25.topN(df, Seq("spark", "hash", "merge"), 2)
      .select("id").as[Long].collect().toSeq
    assert(top.head == 1L && top.size == 2)
    assert(graft.text.Bm25.topN(df, Seq("spark"), 2).queryExecution.executedPlan
      .toString.contains("TakeOrderedAndProject"))
  }

  test("properties: packing conserves tokens, selection caps group sizes, sampling nests") {
    val gen = org.scalacheck.Gen.listOfN(400,
      for {
        id <- org.scalacheck.Gen.choose(1L, 100000L)
        tok <- org.scalacheck.Gen.choose(1L, 5000L)
        g <- org.scalacheck.Gen.oneOf("a", "b", "c")
        s <- org.scalacheck.Gen.choose(0.0, 1.0)
      } yield (id, tok, g, s))
    val rows = gen.sample.get.distinctBy(_._1)
    val df = rows.toDF("doc_id", "ntok", "g", "score").cache()
    try {
      // packing: every row keeps its tokens, bins within a shard are contiguous from 0
      val packed = Packing.packByTokenBudget(df, "doc_id", "ntok", 4000, 4)
      assert(packed.agg(sum("ntok")).as[Long].head() == rows.map(_._2).sum)
      assert(packed.count() == rows.size)
      // every shard starts at bin 0 (gaps allowed: an over-budget doc skips
      // indices), and no bin exceeds budget + its largest single doc
      assert(packed.groupBy("shard").agg(min("bin").as("m")).select("m").as[Long].collect().forall(_ == 0L))
      val binTotals = packed.groupBy("shard", "bin")
        .agg(sum("ntok").as("t"), max("ntok").as("mx")).as[(Long, Long, Long, Long)].collect()
      assert(binTotals.forall { case (_, _, t, mx) => t <= 4000 + mx })
      // selection: never more than k rows per group, all ranks in 1..k
      val sel = Selection.topKPerGroup(df, Seq("g"), "score", 7, "doc_id")
      val perGroup = sel.groupBy("g").count().as[(String, Long)].collect()
      assert(perGroup.forall(_._2 <= 7))
      assert(sel.agg(max("rank")).as[Long].head() <= 7)
      // sampling: fraction thresholds nest for ANY seed
      val s30 = Sampling.deterministicSample(df, "doc_id", 0.3, "p").select("doc_id").as[Long].collect().toSet
      val s70 = Sampling.deterministicSample(df, "doc_id", 0.7, "p").select("doc_id").as[Long].collect().toSet
      assert(s30.subsetOf(s70))
    } finally df.unpersist()
  }

  test("curate: quality, language, dedup, and sample stages compose end-to-end") {
    import graft.pipeline.Curation
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val full = Curation.curate(corpus, Curation.CurationConfig(minQuality = 0.0))
    val filtered = Curation.curate(corpus,
      Curation.CurationConfig(minQuality = 0.3, keepLanguages = Set("en"), sampleFrac = 0.5))
    val nFull = full.count()
    val nFiltered = filtered.count()
    assert(nFull > 0 && nFiltered > 0 && nFiltered < nFull)
    // schema passes through unchanged
    assert(filtered.columns.toSeq == corpus.columns.toSeq)
    // deterministic end-to-end
    assert(Curation.curate(corpus,
      Curation.CurationConfig(minQuality = 0.3, keepLanguages = Set("en"), sampleFrac = 0.5))
      .select("doc_id").as[Long].collect().toSet ==
      filtered.select("doc_id").as[Long].collect().toSet)
    // clustered dedup keeps a subset of (or equal to) greedy-dedup survivors' count
    val clustered = Curation.curate(corpus,
      Curation.CurationConfig(minQuality = 0.0, clusteredDedup = true)).count()
    assert(clustered <= nFull)
  }

  test("repetition signals: duplicate lines/tokens and dominant bigrams are measured") {
    import graft.text.TextFunctions
    val df = Seq(
      (1L, "spam spam spam spam"),          // one token repeated
      (2L, "all words here are different"),
      (3L, "a\nb\na\nb"),                   // duplicate lines
      (4L, "")                               // empty
    ).toDF("doc_id", "text")
    val r = df.select(col("doc_id"), TextFunctions.repetitionSignals(col("text")).as("r"))
      .select(col("doc_id"), col("r.dup_line_frac"), col("r.dup_token_frac"))
      .as[(Long, Double, Double)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r(1L)._2 == 0.75)          // 4 tokens, 1 distinct
    assert(r(2L)._2 == 0.0)
    assert(r(3L)._1 == 0.5)           // 4 lines, 2 distinct
    assert(r(4L) == ((0.0, 0.0)))
    val bg = TextFunctions.topBigramFraction(df).as[(Long, Double)].collect().toMap
    assert(bg(1L) == 1.0)             // "spam spam" is every bigram
    assert(bg(2L) == 0.25 && bg(4L) == 0.0)
  }

  test("piiCounts finds emails, IPs, and long digit runs") {
    import graft.text.TextFunctions
    val df = Seq((1L, "mail me at a.b+c@test.org or 10.0.0.1, card 4111111111111111")).toDF("doc_id", "text")
    val out = df.select(TextFunctions.piiCounts(col("text")).as("p"))
      .select("p.n_emails", "p.n_ipv4", "p.n_long_digit_runs").as[(Long, Long, Long)].head()
    assert(out == ((1L, 1L, 1L)))
  }

  test("bigramLogProb: likely transitions score higher than shuffled ones") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat"),
      (4L, "mat the on sat cat the") // same tokens, improbable transitions
    ).toDF("doc_id", "text")
    val out = graft.text.Tfidf.bigramLogProb(df).as[(Long, Double)].collect().toMap
    assert(out(1L) > out(4L), s"natural order ${out(1L)} should beat shuffled ${out(4L)}")
    assert(out.values.forall(_ <= 1e-9))
  }

  test("unigramLogProb: common-word docs score higher than rare-word docs") {
    val df = Seq(
      (1L, "the the the the"),   // only common tokens
      (2L, "the zzyzx"),         // one rare token drags the mean down
      (3L, "zzyzx qwfp vxjz")    // all rare
    ).toDF("doc_id", "text")
    val out = graft.text.Tfidf.unigramLogProb(df).as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L) && out(2L) > out(3L))
    assert(out.values.forall(_ <= 0.0), "log-probs must be non-positive")
  }

  test("contaminationFlags counts shared shingles against a benchmark set") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally unrelated content with different words here now"),
      (3L, "alpha beta gamma delta epsilon something else entirely")
    ).toDF("doc_id", "text")
    val benchmark = Seq((99L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.contaminationFlags(corpus, benchmark, n = 5, minCommon = 2)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._2, "verbatim benchmark doc must flag")
    assert(out.contains(3L) && out(3L)._1 >= 1, "5-gram prefix overlap must count")
    assert(!out.contains(2L), "unrelated doc must not appear")
  }

  test("tfidf: corpus-wide terms score near tf*1.0, rare terms score higher") {
    val df = Seq(
      (1L, "spark spark rare"),
      (2L, "spark common"),
      (3L, "spark common")
    ).toDF("doc_id", "text")
    val out = Tfidf.tfidf(df).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // 'spark' in all 3 docs: idf = ln(4/4)+1 = 1 -> tfidf == tf
    assert(out((1L, "spark"))._1 == 2L)
    assert(math.abs(out((1L, "spark"))._2 - 2.0) < 1e-9)
    // 'rare' in 1 doc: idf = ln(4/2)+1 > 1
    assert(out((1L, "rare"))._2 > out((2L, "common"))._2)
  }
}
