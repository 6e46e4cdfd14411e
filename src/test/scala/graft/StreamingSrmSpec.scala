package graft

import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming SRM guardrail: windowed arm-split chi-square. */
class StreamingSrmSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedSrm matches the batch chi2 per window; complete outputs on watermark") {
    implicit val sqlCtx = spark.sqlContext
    // window 1: clean 50/50 (chi2 0); window 2: 8 vs 2 (chi2 3.6)
    val w1 = (1 to 10).map(i =>
      (i.toLong, ts("2024-01-01 10:00:05"), "click", 0.0))
    val w2 = (1 to 10).map(i =>
      (i.toLong + 100L, ts("2024-01-01 11:00:05"), "click", 0.0))
    val late = Seq((999L, ts("2024-01-01 13:00:00"), "click", 0.0)) // advances watermark
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("user_id", "ts", "event_type", "value")
    val query = Streaming.windowedSrm(events,
        armB = col("user_id") % 100 % 2 === 0, expectedB = 0.5, "1 hour", "1 minute")
      .writeStream.format("memory").queryName("srm").outputMode("append").start()
    try {
      // w1 split: user_id 1..10 -> 5 even, 5 odd; w2: 101..110 with %100
      // in 1..10 -> same parity split unless we skew it: re-add 6 extra
      // odd rows so w2 reads 5 even vs 11 odd
      input.addData(w1 ++ w2 ++ (1 to 6).map(i =>
        ((2 * i + 101).toLong + 1000L, ts("2024-01-01 11:00:06"), "click", 0.0)): _*)
      query.processAllAvailable()
      input.addData(late: _*)
      query.processAllAvailable()
      val out = spark.table("srm")
        .collect().map(r => r.getAs[Timestamp]("window_start") -> r).toMap
      val r1 = out(ts("2024-01-01 10:00:00"))
      assert(r1.getAs[Long]("n_a") == 5L && r1.getAs[Long]("n_b") == 5L)
      assert(r1.getAs[Double]("chi2") == 0.0)
      val r2 = out(ts("2024-01-01 11:00:00"))
      val na = r2.getAs[Long]("n_a")
      val nb = r2.getAs[Long]("n_b")
      assert(na + nb == 16L)
      // batch-parity: same chi2 as the batch operator on the same rows
      val batchRows = (w2 ++ (1 to 6).map(i =>
        ((2 * i + 101).toLong + 1000L, ts("2024-01-01 11:00:06"), "click", 0.0)))
        .toDF("user_id", "ts", "event_type", "value")
      val batch = graft.operators.Stats.sampleRatioMismatch(
          batchRows.withColumn("g", lit(1)), Seq("g"),
          col("user_id") % 100 % 2 === 0).collect().head
      assert(math.abs(r2.getAs[Double]("chi2") - batch.getAs[Double]("chi2")) < 1e-9)
      assert(batch.getAs[Double]("chi2") > 0.0, "skewed window flags")
    } finally query.stop()
  }
}
