package graft

import graft.operators.{Bootstrap, Debounce}
import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class BootstrapStreamingDebounceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("poisson weights follow the inverse CDF and average ~1") {
    val u = (0 until 10000).map(i => (i + 0.5) / 10000.0).toDF("u")
    val w = u.select(Bootstrap.poissonWeight(col("u")).as("w"))
      .agg(avg("w"), max("w")).head()
    assert(math.abs(w.getDouble(0) - 1.0) < 0.01) // mean of Poisson(1)
    assert(w.getLong(1) == 7L)                    // tail absorbed at 7
  }

  test("bootstrap SE tracks sigma/sqrt(n) and shrinks with n") {
    val vals = (1 to 400).map(i => ("g", (i % 20).toDouble, i.toLong))
    val df = vals.toDF("grp", "v", "id")
    val r = Bootstrap.bootstrapMeanSE(df, Seq("grp"), "v", "id", replicas = 64).head()
    val n = r.getAs[Long]("n")
    assert(n == 400L)
    val mean = r.getAs[Double]("mean_boot")
    assert(math.abs(mean - 9.5) < 0.5)
    val se = r.getAs[Double]("se_boot")
    val sigma = math.sqrt((0 until 20).map(x => math.pow(x - 9.5, 2)).sum / 20)
    val expected = sigma / math.sqrt(400)
    assert(se > expected * 0.5 && se < expected * 2.0) // right order, B=64 noise
  }

  test("bootstrap is deterministic under repartitioning") {
    val df = (1 to 100).map(i => ("g", i.toDouble, i.toLong)).toDF("grp", "v", "id")
    val a = Bootstrap.bootstrapMeanSE(df, Seq("grp"), "v", "id").head().getDouble(3)
    val b = Bootstrap.bootstrapMeanSE(df.repartition(7), Seq("grp"), "v", "id").head().getDouble(3)
    assert(a == b)
  }

  test("streaming debounce matches the batch debouncer on in-order data") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (1L, ts("2024-01-01 10:00:30"), "click", 2.0), // burst -> dropped
      (1L, ts("2024-01-01 10:05:00"), "click", 3.0), // past gap -> kept
      (1L, ts("2024-01-01 10:05:30"), "view", 4.0),  // other type kept
      (2L, ts("2024-01-01 10:00:10"), "click", 5.0)
    )
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("user_id", "ts", "event_type", "value")
      .as[Streaming.Event]
    val query = Streaming.streamingDebounce(events, 60000000L, "1 hour")
      .writeStream.format("memory").queryName("deb").outputMode("append").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val streamed = spark.table("deb").as[Streaming.Event].collect()
        .map(e => (e.user_id, e.ts, e.event_type)).toSet
      val batch = Debounce.debounce(
        rows.toDF("user_id", "ts", "event_type", "value"),
        Seq("user_id", "event_type"), "ts", 60000000L, "value")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSet
      assert(streamed == batch)
      assert(streamed.size == 4)
    } finally query.stop()
  }

  test("streaming funnel matches the batch funnel's reached counts across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val t1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup", 0.0),
      (1L, ts("2024-01-01 10:05:00"), "view", 0.0),
      (2L, ts("2024-01-01 10:01:00"), "view", 0.0),   // view before signup: no entry
      (3L, ts("2024-01-01 10:02:00"), "signup", 0.0))
    val t2 = Seq(
      (1L, ts("2024-01-01 10:10:00"), "purchase", 0.0), // completes across triggers
      (2L, ts("2024-01-01 10:11:00"), "signup", 0.0),
      (3L, ts("2024-01-01 10:12:00"), "purchase", 0.0)) // skips 'view': stuck at 1
    val steps = Seq("signup", "view", "purchase")
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("user_id", "ts", "event_type", "value").as[Streaming.Event]
    val query = Streaming.streamingFunnel(events, steps, "1 hour")
      .writeStream.format("memory").queryName("funl").outputMode("append").start()
    try {
      input.addData(t1: _*); query.processAllAvailable()
      input.addData(t2: _*); query.processAllAvailable()
      val streamed = spark.table("funl").as[Streaming.FunnelHit].collect()
        .groupBy(_.user_id).view.mapValues(_.map(_.reached).max).toMap
      val batch = graft.operators.Funnel
        .funnel((t1 ++ t2).toDF("user_id", "ts", "event_type", "value"),
          "user_id", "ts", "event_type", steps)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(streamed == batch)
      assert(streamed == Map(1L -> 3, 2L -> 1, 3L -> 1))
    } finally query.stop()
  }

  test("streaming debounce state carries across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("user_id", "ts", "event_type", "value")
      .as[Streaming.Event]
    val query = Streaming.streamingDebounce(events, 60000000L, "1 hour")
      .writeStream.format("memory").queryName("deb2").outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00"), "click", 1.0))
      query.processAllAvailable()
      // second trigger: still inside the gap of the event from trigger 1
      input.addData((1L, ts("2024-01-01 10:00:40"), "click", 2.0))
      query.processAllAvailable()
      input.addData((1L, ts("2024-01-01 10:02:00"), "click", 3.0))
      query.processAllAvailable()
      val vals = spark.table("deb2").as[Streaming.Event].collect().map(_.value).toSet
      assert(vals == Set(1.0, 3.0))
    } finally query.stop()
  }
}
