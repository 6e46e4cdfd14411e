package graft

import graft.ann.{KMeans, SemDedup}
import graft.dedup.Dedup
import graft.operators.{BloomJoin, ZOrder}
import graft.pipeline.Selection
import graft.text.UrlFunctions
import org.apache.spark.sql.functions._

class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ semantic dedup

  test("semDedup drops vectors with a lower-id near-identical cluster-mate, keeps the rest") {
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 0.0)),
      (2L, Array(0.999, 0.01, 0.0)), // ~= vec 1 -> victim
      (3L, Array(0.0, 1.0, 0.0)), // same cluster half-space is irrelevant: cosine too low
      (4L, Array(-1.0, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val centroids = Seq(
      (0L, Array(1.0, 0.0, 0.0)),
      (1L, Array(-1.0, 0.0, 0.0))
    ).toDF("cid", "centroid")
    val out = SemDedup.semDedup(vecs, centroids, threshold = 0.95)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 0L), (3L, 0L), (4L, 1L)))
  }

  test("semDedup over-cap clusters are exempt from pruning, not deleted") {
    val vecs = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(1.0, 0.0)), (3L, Array(1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val centroids = Seq((0L, Array(1.0, 0.0))).toDF("cid", "centroid")
    val out = SemDedup.semDedup(vecs, centroids, threshold = 0.9, maxClusterSize = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 3L)) // bucket over cap -> everyone survives
  }

  // -------------------------------------------------------- cross-corpus dedup

  test("dedupAgainst drops docs whose normalized text exists in the reference") {
    val corpus = Seq(
      (1L, "Hello, World!"), (2L, "fresh content"), (3L, "fresh content")
    ).toDF("doc_id", "text")
    val ref = Seq((100L, "hello world")).toDF("doc_id", "text") // normalizes equal to doc 1
    val out = Dedup.dedupAgainst(corpus, ref).select("doc_id").as[Long].collect().toSet
    // doc 1 matches the reference after normalization; internal dups both survive
    assert(out == Set(2L, 3L))
  }

  // ------------------------------------------------------------- bloom join

  test("bloom semi join equals the plain semi join (parity contract)") {
    val fact = (1L to 200L).map(i => (i, i % 7)).toDF("k", "payload")
    val build = Seq(3L, 9L, 400L).toDF("bk")
    val expected = fact.join(build.select(col("bk").as("k")), Seq("k"), "left_semi")
      .as[(Long, Long)].collect().toSet
    val got = BloomJoin.semiJoin(fact, build, "k", "bk", expectedKeys = 10)
      .as[(Long, Long)].collect().toSet
    assert(got == expected && got.map(_._1) == Set(3L, 9L))
  }

  test("bloom join rejects non-integral keys loudly instead of silently dropping matches") {
    val fact = Seq("a", "b").toDF("k")
    val build = Seq("a").toDF("bk")
    val ex = intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(fact, build, "k", "bk", expectedKeys = 10)
    }
    assert(ex.getMessage.contains("integral key"))
  }

  test("bloom pre-filter never loses true matches at any fpp") {
    val fact = (1L to 500L).toDF("k")
    val build = (1L to 500L by 50).toDF("bk")
    val pre = BloomJoin.bloomFilterRows(fact, build, "k", "bk", expectedKeys = 10, fpp = 0.5)
      .as[Long].collect().toSet
    assert((1L to 500L by 50).toSet.subsetOf(pre)) // no false negatives, ever
  }

  // ---------------------------------------------------------------- z-order

  test("interleave produces the Morton code") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y"), bits = 4).as("z"))
      .as[Long].collect().toSeq
    // z(5,3) : x=0101, y=0011 -> bits x0,y0,x1,y1,... = 1,1,0,1,1,0,0,0 -> 0b00011011 = 27
    assert(out == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("z-order clustered write yields files with tight min/max on BOTH keys") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/t"
    val n = 32
    val df = (0 until 1024).map(i => (i % n, i / n)).toDF("x", "y")
    ZOrder.clusteredWrite(df, dir, "x", "y", numFiles = 16, bits = 5)
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      .as[(String, Int, Int, Int, Int)].collect()
    assert(stats.length > 1)
    // every file must cover far less than the full domain on both axes —
    // the whole point of z-clustering (a single-column sort would leave
    // one axis spanning [0, n) in every file)
    assert(stats.forall { case (_, x0, x1, y0, y1) => (x1 - x0) <= n / 2 && (y1 - y0) <= n / 2 })
  }

  // ------------------------------------------------------------------ ntile

  test("ntilePerGroup bins each group independently with deterministic ties") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0), ("a", 4L, 40.0),
      ("b", 5L, 5.0), ("b", 6L, 5.0), ("b", 7L, 9.0)
    ).toDF("g", "id", "v")
    val out = Selection.ntilePerGroup(df, Seq("g"), "v", n = 2, tieBreakCol = "id")
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 1L, 6L -> 1L, 7L -> 2L)) // remainder bucket goes early; tie by id
  }

  // ---------------------------------------------------------------- mixture

  test("mixtureSample tracks target proportions, caps at full groups, drops unweighted") {
    val df = (1L to 1000L).map(i => (i, if (i <= 400) "web" else if (i <= 800) "code" else "junk"))
      .toDF("id", "src")
    val out = graft.pipeline.Sampling.mixtureSample(
      df, "src", "id", Map("web" -> 0.75, "code" -> 0.25, "books" -> 1.0),
      totalBudget = 200, seed = "t")
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!out.contains("junk")) // weight 0 -> dropped
    assert(!out.contains("books")) // weighted but absent from the corpus
    // targets: web 150 of 400 (frac .375), code 50 of 400 (frac .125)
    assert(math.abs(out("web") - 150L) < 40, s"web ${out("web")}")
    assert(math.abs(out("code") - 50L) < 25, s"code ${out("code")}")
  }

  test("mixtureSample delivers the whole group when the target exceeds it") {
    val df = (1L to 50L).map(i => (i, "only")).toDF("id", "src")
    val out = graft.pipeline.Sampling.mixtureSample(
      df, "src", "id", Map("only" -> 1.0), totalBudget = 500, seed = "t")
    assert(out.count() == 50L) // frac caps at 1
  }

  // ------------------------------------------------------------ robust scale

  test("robustScale centers by median, scales by IQR, nulls constant codes") {
    val df = Seq(
      (1L, 1L, "a", 1.0), (2L, 1L, "a", 2.0), (3L, 1L, "a", 3.0),
      (4L, 1L, "a", 4.0), (5L, 1L, "a", 5.0),
      (6L, 2L, "k", 7.0), (7L, 2L, "k", 7.0) // IQR 0 -> NULL, not an error
    ).toDF("event_id", "patient_id", "code", "numeric_value")
    val out = graft.operators.Outliers.robustScale(df, exact = true)
      .select("event_id", "scaled_value").as[(Long, Option[Double])].collect().toMap
    // code a: median 3, q1 2, q3 4 (R-7) -> IQR 2
    assert(out(1L).contains(-1.0) && out(3L).contains(0.0) && out(5L).contains(1.0))
    assert(out(6L).isEmpty && out(7L).isEmpty)
  }

  // ------------------------------------------------------ scalar quantization

  test("scalarQuantize maps min->0, max->255, constant dims->0") {
    val e = Seq(
      (1L, Array(0.0, 5.0, 7.0)),
      (2L, Array(10.0, 5.0, 3.0)),
      (3L, Array(5.0, 5.0, 5.0))
    ).toDF("vec_id", "embedding")
    val out = graft.ann.Embeddings.scalarQuantize(e)
      .as[(Long, Long, Long)].collect().map { case (id, p, c) => (id, p) -> c }.toMap
    assert(out((1L, 0L)) == 0L && out((2L, 0L)) == 255L) // dim 0: [0,10]
    assert(out((3L, 0L)) == 127L) // midpoint floors to 127
    assert(out((1L, 1L)) == 0L && out((2L, 1L)) == 0L) // constant dim -> 0
    assert(out((2L, 2L)) == 0L && out((1L, 2L)) == 255L) // dim 2: [3,7]
  }

  // ---------------------------------------------------------------- keywords

  test("termLift is >1 for group-specific terms and 1 for uniformly-spread terms") {
    val docs = Seq(
      ("en", "common alpha alpha"), ("en", "common alpha"),
      ("de", "common beta beta"), ("de", "common beta")
    ).toDF("lang", "text")
    val out = graft.text.Keywords.termLift(docs, "lang", minCount = 1L)
      .as[(String, String, Long, Double)].collect()
      .map { case (g, t, n, l) => (g, t) -> (n, l) }.toMap
    // alpha: P(t|en)=3/5, P(t)=3/10 -> lift 2; common en: (2/5)/(4/10) -> 1
    assert(math.abs(out(("en", "alpha"))._2 - 2.0) < 1e-9)
    assert(math.abs(out(("en", "common"))._2 - 1.0) < 1e-9)
    assert(!out.contains(("en", "beta"))) // zero count never appears
  }

  // -------------------------------------------------------------------- URL

  test("host and registeredDomain parse the URL shapes that matter") {
    val urls = Seq(
      "https://docs.example.com/a/b?q=1",
      "http://user:pw@Sub.Site.co.uk:8080/path",
      "ftp://plain.host",
      "not a url",
      null
    ).toDF("url")
    val out = urls.select(
      UrlFunctions.host(col("url")).as("h"),
      UrlFunctions.registeredDomain(col("url")).as("d")
    ).as[(Option[String], Option[String])].collect().toSeq
    assert(out == Seq(
      (Some("docs.example.com"), Some("example.com")),
      (Some("sub.site.co.uk"), Some("co.uk")), // 2-label heuristic, PSL caveat documented
      (Some("plain.host"), Some("plain.host")),
      (None, None),
      (None, None)))
  }
}
