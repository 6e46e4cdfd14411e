package graft

import graft.operators.FuzzyJoin

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("chains of fuzzy matches collapse into one entity; strangers stay singletons") {
    val df = Seq(
      (10L, "jon smith"),
      (11L, "john smith"),   // 1 edit from 10
      (12L, "john smyth"),   // 1 edit from 11, 2 from 10
      (13L, "jon smith"),    // identical to 10
      (99L, "completely other name")
    ).toDF("rid", "name")
    val out = FuzzyJoin.resolveEntities(df, "rid", "name", maxDist = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 5)
    assert(Set(10L, 11L, 12L, 13L).map(out) == Set(10L)) // one entity, min id label
    assert(out(99L) == 99L)                               // singleton keeps its id
  }
}
