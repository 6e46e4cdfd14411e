package graft

import graft.ann.Embeddings
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("labelCentroids averages per (group, dimension)") {
    val df = Seq(
      (0, Array(1.0f, 4.0f)),
      (0, Array(3.0f, 0.0f)),
      (1, Array(10.0f, 10.0f))
    ).toDF("label", "vec")
    val out = Embeddings.labelCentroids(df, "label", "vec")
      .as[(Int, Long, Double)].collect()
      .map { case (g, p, c) => (g, p) -> c }.toMap
    assert(out == Map(
      (0, 0L) -> 2.0, (0, 1L) -> 2.0,
      (1, 0L) -> 10.0, (1, 1L) -> 10.0))
  }

  test("l2Normalize yields unit norm and leaves zero vectors zero") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f))
    ).toDF("id", "vec")
    val out = Embeddings.l2Normalize(df, "vec", "n")
      .select(col("id"), col("n")).as[(Long, Seq[Double])].collect().toMap
    assert(out(1L).map(x => math.round(x * 1e9) / 1e9) == Seq(0.6, 0.8))
    assert(out(2L) == Seq(0.0, 0.0))
  }
}
