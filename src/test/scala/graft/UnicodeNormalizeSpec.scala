package graft

import graft.functions.UnicodeNormalize.unicodeNormalize
import org.apache.spark.sql.functions._

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "Café"           // é as one code point
  private val decomposed = "Café"        // e + combining acute
  private val ligature = "ﬁle"            // ﬁle

  test("NFC composes; NFD decomposes; both directions round-trip to equality") {
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "s")
    val nfc = df.select(unicodeNormalize(col("s"), "NFC").as("n"))
      .as[String].collect().toSet
    assert(nfc == Set(composed))
    val nfd = df.select(unicodeNormalize(col("s"), "NFD").as("n"))
      .as[String].collect().toSet
    assert(nfd == Set(decomposed))
  }

  test("NFKC expands compatibility forms (ligatures); NFC does not") {
    val df = Seq(Tuple1(ligature)).toDF("s")
    val out = df.select(
      unicodeNormalize(col("s"), "NFKC").as("k"),
      unicodeNormalize(col("s"), "NFC").as("c"))
      .as[(String, String)].collect()(0)
    assert(out._1 == "file")
    assert(out._2 == ligature)
  }

  test("caseFold lowercases with the root locale after normalizing") {
    val out = Seq(Tuple1("İSTANBUL FILE")).toDF("s")
      .select(unicodeNormalize(col("s"), "NFC", caseFold = true).as("n"))
      .as[String].collect()(0)
    // root-locale lowercase of dotted capital I is i + combining dot —
    // crucially NOT the platform-locale-dependent answer
    assert(out == "i̇stanbul file")
  }

  test("nulls pass through; ASCII takes the no-allocation fast path") {
    val df = Seq((1L, Some("plain ascii")), (2L, None)).toDF("id", "s")
    val out = df.select(col("id"), unicodeNormalize(col("s"), "NFC").as("n"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("plain ascii"))
    assert(out(2L).isEmpty)
  }

  test("invalid form is rejected") {
    intercept[IllegalArgumentException] {
      Seq(Tuple1("x")).toDF("s").select(unicodeNormalize(col("s"), "NFX"))
    }
  }
}
