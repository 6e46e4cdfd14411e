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
