package graft

import graft.functions.TopKByScore
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  test("bounded-heap top-k matches window ranking across many partitions (partial+merge+serde path)") {
    val scored = (1L to 2000L).map { i =>
      (i % 7, i, ((i * 37) % 1000) / 1000.0) // (query_id, id, score) with score ties
    }.toDF("query_id", "id", "score").repartition(16)

    val viaAgg = scored.groupBy("query_id")
      .agg(TopKByScore.topK(col("score"), col("id"), 10).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).as("rank"), col("e.id").as("id"), col("e.score").as("score"))

    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("id").asc)
    val viaWindow = scored
      .withColumn("rank", row_number().over(w) - 1 + 1).filter(col("rank") <= 10)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("id"), col("score"))

    assert(viaAgg.count() == 70)
    assert(viaAgg.except(viaWindow).count() == 0)
    assert(viaWindow.except(viaAgg).count() == 0)
  }

  test("builder casts float scores and int ids to the required double/long") {
    // float score + int id would ClassCastException at execution without
    // the builder-inserted casts (and the expression's type check would
    // reject them if constructed raw)
    val df = Seq((1, 10, 0.5f), (1, 11, 0.9f)).toDF("q", "id", "s")
    val out = df.groupBy("q").agg(TopKByScore.topK(col("s"), col("id"), 1).as("top"))
      .select(explode(col("top")).as("e")).select("e.id").as[Long].collect()
    assert(out.toSeq == Seq(11L))
  }

  test("groups smaller than k return all rows, best first") {
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.9)).toDF("q", "id", "s")
    val out = df.groupBy("q").agg(TopKByScore.topK(col("s"), col("id"), 5).as("top"))
      .select(explode(col("top")).as("e")).select("e.score", "e.id")
      .as[(Double, Long)].collect()
    assert(out.toSeq == Seq((0.9, 11L), (0.9, 12L), (0.5, 10L))) // tie -> lower id first
  }
}
