package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

/** Entity resolution under pathological duplicate distributions: the
  * name-graph design must keep the pair space DICTIONARY-sized no matter
  * how many records share a value — a record-level formulation would
  * explode quadratically in each value's duplicate count.
  */
class EntityScaleGuardSpec extends SparkSpec {
  import spark.implicits._

  test("an all-same-name corpus generates ZERO fuzzy pairs, one entity") {
    // 20k records, one value: record-level pairing would be ~200M pairs
    val df = spark.range(0, 20000).select(col("id"), lit("john smith").as("name"))
    assert(FuzzyJoin.fuzzyPairs(df, "name", maxDist = 2).count() == 0L)
    val resolved = FuzzyJoin.resolveEntities(df, "id", "name", maxDist = 2)
    assert(resolved.count() == 20000L)
    assert(resolved.select("entity_id").distinct().count() == 1L)
    assert(resolved.agg(min("entity_id")).as[Long].collect()(0) == 0L)
  }

  test("two heavily-duplicated near-miss names produce ONE dictionary edge, one merged entity") {
    val df = spark.range(0, 10000).select(col("id"),
      when(col("id") % 2 === 0, "acme corp").otherwise("acme korp").as("name"))
    // the name dictionary has 2 entries -> exactly one candidate pair,
    // regardless of the 5k-record duplicate count behind each name
    assert(FuzzyJoin.candidatePairs(df, "name", Long.MaxValue).count() == 1L)
    val resolved = FuzzyJoin.resolveEntities(df, "id", "name", maxDist = 2)
    assert(resolved.select("entity_id").distinct().count() == 1L)
  }

  test("a junk token shared by every distinct name is df-capped out of candidate generation") {
    // 5k DISTINCT names all sharing the token "inc": without the cap the
    // "inc" bucket alone would explode into ~12.5M candidate pairs
    val df = spark.range(0, 5000).select(col("id"),
      concat(lit("company"), col("id"), lit(" inc")).as("name"))
    val capped = FuzzyJoin.candidatePairs(df, "name", maxTokenDf = 100)
    assert(capped.count() == 0L)
    // resolution still labels every record (each its own entity)
    val resolved = FuzzyJoin.resolveEntities(df, "id", "name", maxDist = 1, maxTokenDf = 100)
    assert(resolved.select("entity_id").distinct().count() == 5000L)
  }
}
