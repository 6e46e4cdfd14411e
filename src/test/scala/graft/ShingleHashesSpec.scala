package graft

import graft.dedup.Dedup
import graft.functions.ShingleHashes
import graft.text.TextFunctions.{md5Hash32, wordTokens}
import org.apache.spark.sql.functions._

/** The native shingle hasher must be bit-identical to the composable
  * md5Hash32(concat_ws(" ", window)) contract — these hashes are the
  * portable cross-engine currency of every dedup oracle.
  */
class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "spark shuffles BIG data, spark shuffles fast"),
    (3L, "a b"),                      // fewer tokens than n
    (4L, ""),                         // no tokens
    (5L, "repeat repeat repeat repeat repeat repeat") // duplicate shingles
  ).toDF("id", "text")

  test("native hashes are bit-identical to the md5Hash32(concat_ws) form") {
    // the old interpreted pipeline, inline
    val toks = wordTokens(col("text"))
    val shingles = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
      .otherwise(array().cast("array<string>"))
    val reference = texts
      .select(col("id"), explode(shingles).as("s"))
      .select(col("id"), md5Hash32(col("s")).as("sh"))
    val native = texts
      .select(col("id"), explode(ShingleHashes.shingleHashes(wordTokens(col("text")), 3)).as("sh"))
    assert(native.exceptAll(reference).isEmpty && reference.exceptAll(native).isEmpty)
    assert(native.count() > 0)
  }

  test("guards: short docs give empty arrays, null text gives null") {
    val out = texts.select(col("id"),
      ShingleHashes.shingleHashes(wordTokens(col("text")), 3).as("hs"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(out(3L).isEmpty && out(4L).isEmpty)
    assert(out(5L).length == 4) // duplicates KEPT (callers array_distinct)
    val nullText = Seq((9L, null.asInstanceOf[String])).toDF("id", "text")
      .select(ShingleHashes.shingleHashes(wordTokens(col("text")), 3))
    assert(nullText.collect()(0).isNullAt(0))
  }

  test("shingleHashTable output is unchanged (distinct per-doc hashed shingles)") {
    val viaTable = Dedup.shingleHashTable(texts, "id", "text", 3)
    val reference = texts
      .select(col("id"), wordTokens(col("text")).as("t"))
      .select(col("id"), explode(when(size(col("t")) >= 3,
        transform(sequence(lit(0), size(col("t")) - 3),
          i => concat_ws(" ", slice(col("t"), i + 1, lit(3)))))
        .otherwise(array().cast("array<string>"))).as("s"))
      .select(col("id"), md5Hash32(col("s")).as("sh"))
      .distinct()
    assert(viaTable.exceptAll(reference).isEmpty && reference.exceptAll(viaTable).isEmpty)
  }

  test("zero shuffles in the shingle table plan") {
    val plan = Dedup.shingleHashTable(texts, "id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free shingle table:\n$plan")
  }

}
