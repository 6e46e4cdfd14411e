package graft

import graft.operators.{Attribution, Graph, Stats, Survival}
import graft.text.{TextFunctions, Winnow}
import org.apache.spark.sql.functions._

/** Round-5 batch: readability, lexical diversity, winnowing
  * fingerprints, touch attribution, Welch A/B test, Kaplan–Meier
  * survival, local clustering coefficient.
  */
class Round5cOpsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  // ----------------------------------------------------------- readability

  test("readability: hand-computed Flesch on a known sentence pair") {
    val df = Seq("The cat sat. The dog ran!").toDF("text")
    val r = df.select(TextFunctions.readability(col("text")).as("r"))
      .select(col("r.*")).collect()(0)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_words") == 6L)
    // one vowel group per word: e, a, a, e, o, a
    assert(r.getAs[Long]("n_syllables") == 6L)
    val expected = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert(math.abs(r.getAs[Double]("flesch") - expected) < 1e-9)
  }

  test("readability: multi-syllable words count vowel GROUPS, not vowels") {
    val r = Seq("Beautiful education.").toDF("text")
      .select(TextFunctions.readability(col("text")).as("r"))
      .select(col("r.*")).collect()(0)
    // beautiful -> eau, i, u (3); education -> e, u, a, io (4)
    assert(r.getAs[Long]("n_syllables") == 7L)
  }

  test("readability: sentence-less / word-less text yields NULL flesch") {
    val rows = Seq("", "12345 678", "!!!").toDF("text")
      .select(TextFunctions.readability(col("text")).as("r"))
      .select(col("r.flesch")).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  // ----------------------------------------------------- lexical diversity

  test("lexicalDiversity: unigram vs bigram TTR separates cyclic repetition") {
    val r = Seq("a b a b a b").toDF("text")
      .select(TextFunctions.lexicalDiversity(col("text")).as("l"))
      .select(col("l.*")).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_types") == 2L)
    assert(math.abs(r.getAs[Double]("ttr") - 2.0 / 6.0) < 1e-9)
    // bigrams: "a b","b a","a b","b a","a b" -> 5 total, 2 distinct
    assert(r.getAs[Long]("n_bigram_types") == 2L)
    assert(math.abs(r.getAs[Double]("bigram_ttr") - 2.0 / 5.0) < 1e-9)
  }

  test("lexicalDiversity: token-less text has NULL ratios; single token has no bigrams") {
    val rows = Seq(("", 1), ("word", 2)).toDF("text", "k")
      .select(col("k"), TextFunctions.lexicalDiversity(col("text")).as("l"))
      .select(col("k"), col("l.*")).sort("k").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("ttr")))
    assert(rows(1).getAs[Long]("n_tokens") == 1L)
    assert(rows(1).getAs[Long]("n_bigram_types") == 0L)
    assert(rows(1).isNullAt(rows(1).fieldIndex("bigram_ttr")))
  }

  // ----------------------------------------------------------- winnowing

  test("winnow: window minima match a brute-force fold over the shingle hashes") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "short doc here now"),
      (3L, "tiny doc")).toDF("doc_id", "text")
    val k = 3; val w = 4
    val hashes = docs
      .select(col("doc_id"), graft.functions.ShingleHashes
        .shingleHashes(TextFunctions.wordTokens(col("text")), k).as("h"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    val got = Winnow.fingerprintStats(docs, k = k, w = w)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_fingerprints")))).toMap
    hashes.foreach { case (id, h) =>
      val expected =
        if (h.isEmpty) Set.empty[Long]
        else (1 to math.max(h.length - w + 1, 1))
          .map(i => h.slice(i - 1, i - 1 + w).min).toSet
      assert(got(id) == ((h.length.toLong, expected.size.toLong)),
        s"doc $id: got ${got(id)}, h=$h expected fp=$expected")
    }
    // doc 3 has 2 tokens < k=3: zero shingles, zero fingerprints
    assert(got(3L) == ((0L, 0L)))
  }

  test("winnow: docs sharing a >= w+k-1-token substring share a fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"unrelated prefix words $shared trailing bits"),
      (2L, s"$shared completely different ending material")).toDF("doc_id", "text")
    val fps = Winnow.fingerprintTable(docs, k = 5, w = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("fp"))
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "8-token shared substring (= w+k-1) must share a winnowed fingerprint")
  }

  test("winnow: density lands near 2/(w+1) on prose-sized docs") {
    // letter-only pseudorandom words (digits would be stripped by the
    // [a-z] tokenizer and collapse every token to one type)
    def word(v: Int): String = {
      var x = v + 700; val sb = new StringBuilder
      while (x > 0) { sb.append(('a' + x % 26).toChar); x /= 26 }
      sb.toString
    }
    val words = (1 to 500).map(i => word(i * 7919 % 1013)).mkString(" ")
    val d = Winnow.fingerprintStats(Seq((1L, words)).toDF("doc_id", "text"), k = 5, w = 4)
      .collect()(0).getAs[Double]("density")
    assert(d > 0.2 && d < 0.6, s"density $d implausible for w=4 (expect ~0.4)")
  }

  // ----------------------------------------------------------- attribution

  test("touchAttribution: first/last touch and prior count per conversion") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, "signup"),
      (2L, ts("2024-01-01 11:00:00"), 10L, "view"),
      (3L, ts("2024-01-01 12:00:00"), 10L, "purchase"),
      (4L, ts("2024-01-01 13:00:00"), 10L, "purchase"),
      (5L, ts("2024-01-02 09:00:00"), 20L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Attribution
      .touchAttribution(ev, "user_id", "ts", "event_type", "event_id", "purchase")
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[String]("first_touch")), Option(r.getAs[String]("last_touch")),
          r.getAs[Long]("n_prior")))).toMap
    assert(out(3L) == ((Some("signup"), Some("view"), 2L)))
    assert(out(4L) == ((Some("signup"), Some("purchase"), 3L)))
    // first-ever event is the conversion: nothing to attribute
    assert(out(5L) == ((None, None, 0L)))
    assert(out.size == 3)
  }

  test("touchAttribution: equal timestamps break ties on the tie column") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val ev = Seq(
      (2L, t0, 1L, "view"),
      (1L, t0, 1L, "signup"),
      (3L, t0, 1L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val r = Attribution
      .touchAttribution(ev, "user_id", "ts", "event_type", "event_id", "purchase")
      .collect()(0)
    assert(r.getAs[String]("first_touch") == "signup")
    assert(r.getAs[String]("last_touch") == "view")
  }

  // ------------------------------------------------------------ Welch test

  test("welchTest: hand-computed z on a tiny two-arm fixture") {
    val df = Seq(
      ("x", 1.0, false), ("x", 2.0, false), ("x", 3.0, false),
      ("x", 2.0, true), ("x", 4.0, true)
    ).toDF("g", "value", "b")
    val r = Stats.welchTest(df, Seq("g"), "value", col("b")).collect()(0)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(math.abs(r.getAs[Double]("mean_a") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("mean_b") - 3.0) < 1e-9)
    val se = math.sqrt(1.0 / 3.0 + 2.0 / 2.0) // varA=1 (n=3), varB=2 (n=2)
    assert(math.abs(r.getAs[Double]("se") - se) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") - 1.0 / se) < 1e-9)
  }

  test("welchTest: an arm below n=2 yields NULL se/z; NaN and NULL values drop") {
    val df = Seq(
      ("g", Some(1.0), false), ("g", Some(2.0), false),
      ("g", Some(5.0), true), ("g", Some(Double.NaN), true), ("g", None, true)
    ).toDF("g", "value", "b")
    val r = Stats.welchTest(df, Seq("g"), "value", col("b")).collect()(0)
    assert(r.getAs[Long]("n_b") == 1L)
    assert(r.isNullAt(r.fieldIndex("se")) && r.isNullAt(r.fieldIndex("z")))
    assert(math.abs(r.getAs[Double]("mean_b") - 5.0) < 1e-9)
  }

  // -------------------------------------------------------- Kaplan–Meier

  test("kaplanMeier: hand-computed curve with censoring") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: day 0 -> purchase day 1 (observed t=1)
      (1L, ts("2024-01-01 00:00:00"), "view"), (1L, ts("2024-01-02 00:00:00"), "purchase"),
      // u2: day 0 -> last seen day 2, no purchase (censored t=2)
      (2L, ts("2024-01-01 00:00:00"), "view"), (2L, ts("2024-01-03 00:00:00"), "click"),
      // u3: purchase immediately (observed t=0)
      (3L, ts("2024-01-05 00:00:00"), "purchase"),
      // u4: censored at t=3
      (4L, ts("2024-01-01 00:00:00"), "signup"), (4L, ts("2024-01-04 00:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Survival.kaplanMeier(ev, "user_id", "ts", "event_type", "purchase")
      .collect().map(r => r.getAs[Long]("t_day") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("d_events"), r.getAs[Long]("c_censored"),
          r.getAs[Double]("log_s")))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    val h0 = r6(math.log(1 - 1.0 / 4.0))
    val h1 = r6(math.log(1 - 1.0 / 3.0))
    assert(out(0L)._1 == 4L && out(0L)._2 == 1L && out(0L)._3 == 0L)
    assert(math.abs(out(0L)._4 - h0) < 1e-9)
    assert(out(1L)._1 == 3L && out(1L)._2 == 1L)
    assert(math.abs(out(1L)._4 - (h0 + h1)) < 1e-9)
    // censor-only days keep log_s flat
    assert(out(2L)._1 == 2L && out(2L)._3 == 1L && math.abs(out(2L)._4 - (h0 + h1)) < 1e-9)
    assert(out(3L)._1 == 1L && out(3L)._3 == 1L && math.abs(out(3L)._4 - (h0 + h1)) < 1e-9)
  }

  test("kaplanMeier: terminal day where everyone converts emits NULL log_s, not -inf") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"), (1L, ts("2024-01-02 00:00:00"), "purchase"),
      (2L, ts("2024-01-01 00:00:00"), "view"), (2L, ts("2024-01-02 00:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val rows = Survival.kaplanMeier(ev, "user_id", "ts", "event_type", "purchase").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("n_risk") == 2L && rows(0).getAs[Long]("d_events") == 2L)
    assert(rows(0).isNullAt(rows(0).fieldIndex("log_s")))
  }

  // --------------------------------------------- clustering coefficient

  test("clusteringCoefficient: triangle + pendant, with noise edges dropped") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"), // triangle
      ("c", "d"),                         // pendant
      ("b", "a"),                         // reverse duplicate
      ("d", "d")                          // self-loop
    ).toDF("src", "dst")
    val out = Graph.clusteringCoefficient(edges)
      .collect().map(r => r.getAs[String]("node") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
          Option(r.get(r.fieldIndex("coef"))).map(_.asInstanceOf[Double])))).toMap
    assert(out("a") == ((2L, 1L, Some(1.0))))
    assert(out("b") == ((2L, 1L, Some(1.0))))
    assert(out("c")._1 == 3L && out("c")._2 == 1L)
    assert(math.abs(out("c")._3.get - 1.0 / 3.0) < 1e-9)
    assert(out("d") == ((1L, 0L, None)))
  }
}
