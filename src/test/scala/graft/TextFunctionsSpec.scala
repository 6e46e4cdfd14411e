package graft

import graft.text.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getAs[T]("r")

  test("wordTokens lowercases and splits on non-letter runs") {
    assert(one[collection.Seq[String]](wordTokens(col("t")), "The cat, the DOG!") == Seq("the", "cat", "the", "dog"))
    assert(one[collection.Seq[String]](wordTokens(col("t")), "123 456") == Seq())
  }

  test("wordShingles emits n-grams and guards short docs") {
    assert(one[collection.Seq[String]](wordShingles(col("t"), 2), "a b c") == Seq("a b", "b c"))
    assert(one[collection.Seq[String]](wordShingles(col("t"), 5), "a b c") == Seq())
  }

  test("langId picks the language with most stopword hits, und on zero hits") {
    assert(one[String](langId(col("t")), "the cat and the dog is in that house") == "en")
    assert(one[String](langId(col("t")), "el perro y la casa de los gatos") == "es")
    assert(one[String](langId(col("t")), "xyzzy qwerty plugh") == "und")
  }

  test("token counts: whitespace and bpe-ish") {
    assert(one[Int](whitespaceTokenCount(col("t")), "  two   words ") == 2)
    // "ab 12 c!" -> [ab] [1] [2] [c] [!]
    assert(one[Int](bpeishTokenCount(col("t")), "ab 12 c!") == 5)
  }

  test("fingerprint is invariant to case/punctuation/whitespace") {
    val a = one[String](fingerprint(col("t")), "Hello,   World!")
    val b = one[String](fingerprint(col("t")), "hello world")
    val c = one[String](fingerprint(col("t")), "hello worlds")
    assert(a == b && a != c)
  }

  test("md5Hash32 matches the first-8-hex-chars-of-md5 contract") {
    // md5("a") = 0cc175b9c0f1b6a831c399e269772661 -> 0x0cc175b9 = 214005177
    assert(one[Long](md5Hash32(col("t")), "a") == 214005177L)
  }

  test("native rolling hash matches the per-char ascii fold and handles empty strings") {
    val hofForm = expr(
      "aggregate(transform(sequence(1, length(__n)), i -> CAST(ascii(substr(__n, i, 1)) AS BIGINT)), CAST(0 AS BIGINT), (acc, c) -> (acc*31 + c) % 1000000007)")
    val df = Seq("Hello, World!", "a", "", "The quick brown fox 123  jumps.").toDF("t")
      .withColumn("__n", normalizeForFingerprint(col("t")))
      .select(
        rollingFingerprint(col("t")).as("native"),
        when(length(col("__n")) === 0, lit(0L)).otherwise(hofForm).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("native").isNull).count() == 0)
  }

  test("two rolling-hash parameterizations in one projection hash independently") {
    // regression: codegen used a FIXED generated-function name, so two
    // instances with different (base, modulus) in the same codegen class
    // silently shared one body
    import graft.functions.RollingHash.rollingHash
    val row = Seq("abc").toDF("t").select(
      rollingHash(col("t"), base = 31, modulus = 1000000007L).as("h31"),
      rollingHash(col("t"), base = 131, modulus = 1000000007L).as("h131")
    ).collect()(0)
    // abc bytes: 97 98 99
    def ref(base: Long) = ((97 * base + 98) * base + 99) % 1000000007L
    assert(row.getLong(0) == ref(31))
    assert(row.getLong(1) == ref(131))
  }

  test("tensor code narrowing picks the smallest sufficient type") {
    import graft.operators.Tensorize
    import org.apache.spark.sql.types._
    assert(Tensorize.narrowestIndexType(100) == ByteType)
    assert(Tensorize.narrowestIndexType(1000) == ShortType)
    assert(Tensorize.narrowestIndexType(100000) == IntegerType)
    assert(Tensorize.narrowestIndexType(1L << 40) == LongType)
  }

  test("deflateRatio separates repetitive text from varied text, deterministically") {
    val repetitive = "spam ham " * 200
    val varied = (1 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val rr = one[Double](deflateRatio(col("t")), repetitive)
    val rv = one[Double](deflateRatio(col("t")), varied)
    assert(rr < 0.1, s"boilerplate should compress hard, got $rr")
    assert(rv > rr * 3, s"varied text must compress far less: varied=$rv repetitive=$rr")
    assert(rv <= 1.1, s"ratio should stay near <= 1, got $rv")
    assert(one[Double](deflateRatio(col("t")), "") == 1.0)
    // deterministic across evaluations
    assert(one[Double](deflateRatio(col("t")), repetitive) == rr)
  }

  test("qualityFeatures and score are bounded and favor natural text") {
    val natural = "The quick brown fox jumps over the lazy dog and runs to the old barn."
    val junk = "!!!??? ;;;;; ..... !!!!"
    val qn = one[Double](qualityScore(col("t")), natural)
    val qj = one[Double](qualityScore(col("t")), junk)
    assert(qn > qj)
    assert(qn >= 0.0 && qn <= 1.0 && qj >= 0.0 && qj <= 1.0)
  }

  test("gopherRules: each rule fires on its pathology, natural prose passes") {
    def g(text: String): org.apache.spark.sql.Row =
      Seq(text).toDF("t").select(gopherRules(col("t")).as("g")).select("g.*").collect()(0)

    // 60 natural words with stopword hits -> passes
    val prose = (("the quick brown fox jumps over that lazy dog of mine " +
      "and it will have run with great speed to be near the barn ") * 3).trim
    val ok = g(prose)
    assert(ok.getAs[Boolean]("passes"), s"natural prose should pass: $ok")
    assert(ok.getAs[Long]("n_words") >= 50L)

    // too short
    assert(!g("the cat and that dog have fun with it").getAs[Boolean]("passes"))

    // bullet-dominated doc fails rule 4 even with enough words
    val bullets = (1 to 60).map(i => s"- item $i of the list that we have").mkString("\n")
    val bg = g(bullets)
    assert(bg.getAs[Double]("bullet_frac") >= 0.9 && !bg.getAs[Boolean]("passes"))

    // ellipsis-heavy lines fail rule 5
    val ell = (1 to 60).map(i => s"teaser number $i of the story that we have...").mkString("\n")
    val eg = g(ell)
    assert(eg.getAs[Double]("ellipsis_frac") >= 0.3 && !eg.getAs[Boolean]("passes"))

    // symbol soup fails rule 3: '#' per word >= 0.1
    val hashy = prose + " " + ("#tag " * 20).trim
    val hg = g(hashy)
    assert(hg.getAs[Double]("symbol_ratio") >= 0.1 && !hg.getAs[Boolean]("passes"))

    // numeric tokens fail rule 6 (alpha word fraction)
    val nums = ("the of and that " + (1 to 60).map(_.toString).mkString(" "))
    val ng = g(nums)
    assert(ng.getAs[Double]("alpha_word_frac") <= 0.8 && !ng.getAs[Boolean]("passes"))

    // empty text: denominators guard, no NaN/null, fails on word count
    val z = g("")
    assert(z.getAs[Long]("n_words") == 0L && !z.getAs[Boolean]("passes"))
    assert(!z.anyNull)
  }
}
