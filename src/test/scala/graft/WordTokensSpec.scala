package graft

import org.apache.spark.sql.functions._

/** Parity pin for the round-13 native tokenizer: bit-identical token
  * arrays (and schema) vs the composable regex form every text oracle
  * was written against.
  */
class WordTokensSpec extends SparkSpec {
  import spark.implicits._

  private def hof(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z]+"), t => t =!= "")

  test("native tokenizer matches the regex+filter form on real-ish text") {
    val docs = Seq(
      "The quick brown fox jumps over the lazy dog",
      "  leading and trailing  ",
      "punctuation, numbers 123 and CAPS mixed-in!",
      "hyphen-ated under_scored dot.sep",
      "",
      "1234 5678",
      "a",
      "Z"
    ).toDF("text")
    val both = docs.select(
      graft.text.TextFunctions.wordTokens(col("text")).as("native"),
      hof(col("text")).as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
  }

  test("unicode edges: locale-free lowercase mappings match `lower`") {
    // Turkish dotted capital I lowers to i + combining dot; Kelvin sign
    // lowers to plain k; sharp s and accented letters stay non-[a-z]
    val docs = Seq(
      "İstanbul KKelvin straße café École",
      "emoji 😀 mixed space",
      "İİİ"
    ).toDF("text")
    val both = docs.select(
      graft.text.TextFunctions.wordTokens(col("text")).as("native"),
      hof(col("text")).as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
  }

  test("filterInSet matches the interpreted isInCollection filter") {
    val words = Seq("the", "and", "of", "la", "de")
    val docs = Seq(
      "the cat and the dog of de la",
      "no stopwords here at all",
      ""
    ).toDF("text")
    val toks = graft.text.TextFunctions.wordTokens(col("text"))
    val both = docs.select(
      graft.functions.WordTokens.filterInSet(toks, words).as("native"),
      filter(toks, t => t.isInCollection(words)).as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
    // null array and null elements
    val edge = spark.sql(
      "SELECT CAST(NULL AS array<string>) AS a UNION ALL SELECT array('the', NULL, 'x')")
    val both2 = edge.select(
      graft.functions.WordTokens.filterInSet(col("a"), words).as("native"),
      filter(col("a"), t => t.isInCollection(words)).as("hof"))
    assert(both2.filter(not(col("native") <=> col("hof"))).count() == 0)
    val sN = edge.select(graft.functions.WordTokens.filterInSet(col("a"), words)).schema.head.dataType
    val sH = edge.select(filter(col("a"), t => t.isInCollection(words))).schema.head.dataType
    assert(sN == sH)
  }

  test("asciiCharCount matches the regex-count forms (alpha, punct, non-ws)") {
    val docs = Seq(
      "The quick brown fox!! Jumps; over: 123, dots...",
      "  \t\n whitespace   soup \r\n",
      "İstanbul KKelvin straße café 😀 mixed",
      "",
      "ALLCAPS AND digits 42"
    ).toDF("text")
    val t = col("text")
    val both = docs.select(
      graft.functions.WordTokens.asciiCharCount(
        t, "abcdefghijklmnopqrstuvwxyz", negate = false, lowercase = true).as("na"),
      length(regexp_replace(lower(t), "[^a-z]", "")).as("ha"),
      graft.functions.WordTokens.asciiCharCount(t, ".!?,;:").as("np"),
      length(regexp_replace(t, "[^.!?,;:]", "")).as("hp"),
      graft.functions.WordTokens.asciiCharCount(t, " \t\n\f\r", negate = true).as("nw"),
      length(regexp_replace(t, "\\s", "")).as("hw"))
    assert(both.filter(
      not(col("na") <=> col("ha")) || not(col("np") <=> col("hp")) ||
        not(col("nw") <=> col("hw"))).count() == 0)
    val nullRow = spark.sql("SELECT CAST(NULL AS STRING) AS text").select(
      graft.functions.WordTokens.asciiCharCount(col("text"), "az")).collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("asciiTokenCount matches the split/regexp_extract_all count forms") {
    val docs = Seq(
      "The quick brown fox!! Jumps; over: 123, dots...",
      "  \t\n whitespace   soup \r\n",
      "İstanbul KKelvin straße café 😀 mixed",
      "",
      "a",
      " x ",
      "ALLCAPS AND digits 42 mixed-in hyphen-ated 3.14",
      " vertical tab run  end",
      "ab12cd!?ef 😀😀 tail"
    ).toDF("text")
    val t = col("text")
    val both = docs.select(
      graft.functions.WordTokens.asciiTokenCount(t, bpeish = false).as("nws"),
      size(filter(split(t, "\\s+"), x => x =!= "")).as("hws"),
      graft.functions.WordTokens.asciiTokenCount(t, bpeish = true).as("nbp"),
      size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).as("hbp"))
    assert(both.filter(
      not(col("nws") <=> col("hws")) || not(col("nbp") <=> col("hbp"))).count() == 0)
    val nullRow = spark.sql("SELECT CAST(NULL AS STRING) AS text").select(
      graft.functions.WordTokens.asciiTokenCount(col("text"), bpeish = true)).collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("null text yields null, and schemas agree") {
    val docs = spark.sql("SELECT CAST(NULL AS STRING) AS text")
    val r = docs.select(graft.text.TextFunctions.wordTokens(col("text"))).collect()(0)
    assert(r.isNullAt(0))
    val sNative = Seq("x").toDF("text")
      .select(graft.text.TextFunctions.wordTokens(col("text"))).schema.head.dataType
    val sHof = Seq("x").toDF("text").select(hof(col("text"))).schema.head.dataType
    assert(sNative == sHof)
  }
}
