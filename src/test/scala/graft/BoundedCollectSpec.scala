package graft

import graft.functions.BoundedCollectLongs.boundedCollect
import org.apache.spark.sql.functions._

class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("collects sorted ids under the cap, NULLs groups over it (partial+merge path)") {
    // group 1: 5 ids (under cap), group 2: 40 ids (over cap of 10)
    val df = ((1 to 5).map(i => (1L, i * 10L)) ++ (1 to 40).map(i => (2L, i.toLong)))
      .toDF("g", "id").repartition(8) // force partial buffers + merges
    val out = df.groupBy("g").agg(boundedCollect(col("id"), 10).as("ids"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out(1L).get == Seq(10L, 20L, 30L, 40L, 50L)) // sorted
    assert(out(2L).isEmpty) // poisoned to null, not truncated
  }

  test("nulls in the child are ignored; empty groups give empty arrays") {
    val df = Seq((1L, Some(3L)), (1L, None), (2L, None)).toDF("g", "id")
    val out = df.groupBy("g").agg(boundedCollect(col("id"), 5).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(3L))
    assert(out(2L) == Seq())
  }
}
