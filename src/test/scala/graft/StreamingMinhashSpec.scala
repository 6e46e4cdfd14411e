package graft

import graft.dedup.Dedup
import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingMinhashSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val longA = "the quick brown fox jumps over the lazy dog again and again every day"
  private val longB = "completely different content about spark shuffles and partition pruning at scale"

  test("per-row minhash signature matches the batch explode+groupBy signatures") {
    val docs = Seq(
      (1L, longA),
      (2L, longB),
      (3L, "too short") // < n tokens -> no shingles
    ).toDF("doc_id", "text")
    val batch = Dedup.minhashSignatures(docs, numHashes = 8, n = 5)
      .select(col("id"), array((0 until 8).map(j => col(s"minhash_$j")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val perRow = docs
      .transform(d => Dedup.withMinhashSig(d, col("text"), "sig", 8, 5))
      .select(col("doc_id"), col("sig"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(perRow(1L).get == batch(1L))
    assert(perRow(2L).get == batch(2L))
    assert(perRow(3L).isEmpty && !batch.contains(3L)) // batch has no row for shingle-less docs
  }

  test("streaming minhash dedup suppresses signature-identical docs within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = Streaming.streamingMinhashDedup(docs, "1 hour")
      .writeStream.format("memory").queryName("mh_dedup").outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), longA),
        (2L, ts("2024-01-01 10:05:00"), longA), // identical -> suppressed
        (3L, ts("2024-01-01 10:10:00"), longB),
        (4L, ts("2024-01-01 10:12:00"), "tiny one"), // no shingles, kept
        (5L, ts("2024-01-01 10:13:00"), "tiny two")) // no shingles, distinct text, kept
      query.processAllAvailable()
      input.addData((6L, ts("2024-01-01 10:20:00"), longA)) // later copy, still inside horizon
      query.processAllAvailable()
      val ids = spark.table("mh_dedup").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L, 4L, 5L), s"got $ids")
    } finally query.stop()
  }

  test("null-text docs are all kept, not collapsed into one NULL dedup key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Option[String])]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = Streaming.streamingMinhashDedup(docs, "1 hour")
      .writeStream.format("memory").queryName("mh_dedup_null").outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), None),
        (2L, ts("2024-01-01 10:05:00"), None), // null text carries no
        // comparable content; md5(NULL) must not merge it with doc 1
        (3L, ts("2024-01-01 10:06:00"), Some("")),
        (4L, ts("2024-01-01 10:07:00"), Some(longA)))
      query.processAllAvailable()
      val ids = spark.table("mh_dedup_null").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 3L, 4L), s"got $ids")
    } finally query.stop()
  }

  test("streaming latest-per-key maintains the same state the batch compactor computes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Timestamp, Double)]
    val log = input.toDF().toDF("user_id", "event_type", "event_id", "ts", "value")
    val query = Streaming.streamingLatestPerKey(log, Seq("user_id", "event_type"), Seq("ts", "event_id"))
      .writeStream.format("memory").queryName("compacted").outputMode("complete").start()
    try {
      input.addData(
        (1L, "a", 10L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, "a", 11L, ts("2024-01-01 12:00:00"), 2.0))
      query.processAllAvailable()
      input.addData(
        (1L, "a", 12L, ts("2024-01-01 11:00:00"), 9.0), // older than current state -> ignored
        (2L, "b", 20L, ts("2024-01-01 09:00:00"), 3.0))
      query.processAllAvailable()
      val state = spark.table("compacted")
        .select("user_id", "event_type", "event_id", "value")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(state == Set((1L, "a", 11L, 2.0), (2L, "b", 20L, 3.0)))
      // parity with the batch compactor over the full replayed log
      val batch = graft.operators.Compact.latestPerKey(
        Seq(
          (1L, "a", 10L, ts("2024-01-01 10:00:00"), 1.0),
          (1L, "a", 11L, ts("2024-01-01 12:00:00"), 2.0),
          (1L, "a", 12L, ts("2024-01-01 11:00:00"), 9.0),
          (2L, "b", 20L, ts("2024-01-01 09:00:00"), 3.0)
        ).toDF("user_id", "event_type", "event_id", "ts", "value"),
        Seq("user_id", "event_type"), Seq("ts", "event_id"))
        .select("user_id", "event_type", "event_id", "value")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(state == batch)
    } finally query.stop()
  }

  test("frequent-items sketch runs as streaming aggregation state across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val query = input.toDF().toDF("item")
      .agg(graft.functions.FrequentItems.frequentItems(col("item"), 3).as("c"))
      .writeStream.format("memory").queryName("fi_stream").outputMode("complete").start()
    try {
      input.addData(Seq.fill(10)("hot") ++ Seq("a", "b"): _*)
      query.processAllAvailable()
      input.addData(Seq.fill(15)("hot2") ++ Seq("c"): _*)
      query.processAllAvailable()
      // the buffer survived the trigger boundary: both epochs' heavy
      // items are present with their full cross-trigger weight floor
      val items = spark.table("fi_stream")
        .select(explode(col("c")).as("c")).select("c.item", "c.weight")
        .as[(String, Long)].collect().toMap
      assert(items.contains("hot") && items.contains("hot2"), s"got $items")
      assert(items("hot") >= 8 && items("hot2") >= 13)
    } finally query.stop()
  }

  test("stream-stream interval join matches only within the event-time window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val joined = Streaming.streamStreamIntervalJoin(
      clicks.toDF().toDF("user_id", "ts", "page"),
      buys.toDF().toDF("user_id", "bts", "amount"),
      on = "user_id", leftTs = "ts", rightTs = "bts",
      lookBack = "30 minutes", lookAhead = "0 seconds")
    val query = joined
      .select(col("user_id"), col("page"), col("amount"))
      .writeStream.format("memory").queryName("ssij").outputMode("append").start()
    try {
      buys.addData(
        (1L, ts("2024-01-01 10:00:00"), 5.0),   // 10 min before click: in window
        (1L, ts("2024-01-01 09:00:00"), 7.0),   // 70 min before: outside
        (2L, ts("2024-01-01 10:05:00"), 9.0))   // other user
      clicks.addData((1L, ts("2024-01-01 10:10:00"), "home"))
      query.processAllAvailable()
      val rows = spark.table("ssij").as[(Long, String, Double)].collect().toSet
      assert(rows == Set((1L, "home", 5.0)), s"got $rows")
    } finally query.stop()
  }

  test("session_window summaries run the SAME plan incrementally under a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val agg = graft.operators.Sessionize.sessionWindowSummaries(
      input.toDF().toDF("user_id", "ts").withWatermark("ts", "10 minutes"),
      "user_id", "ts", "30 minutes")
    val query = agg.writeStream.format("memory").queryName("ssw").outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")))
      query.processAllAvailable()
      // advance the watermark far past the session to finalize it
      input.addData((1L, ts("2024-01-01 13:00:00")))
      query.processAllAvailable()
      val rows = spark.table("ssw").as[(Long, Long, Long, Long)].collect().toSet
      val us = (s: String) => ts(s).getTime * 1000L
      assert(rows == Set((1L, 2L, us("2024-01-01 10:00:00"), us("2024-01-01 10:10:00"))))
    } finally query.stop()
  }

  test("streaming LSH candidates pair newcomers with the bucket canonical, never cross-content") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = Streaming.streamingLshCandidates(docs, "1 hour")
      .writeStream.format("memory").queryName("lsh_cand").outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), longA),
        (3L, ts("2024-01-01 10:02:00"), longB))
      query.processAllAvailable()
      input.addData(
        (2L, ts("2024-01-01 10:05:00"), longA), // same buckets as 1 -> pair (1,2)
        (5L, ts("2024-01-01 10:06:00"), longA)) // -> pair (1,5)
      query.processAllAvailable()
      val pairs = spark.table("lsh_cand")
        .select("id_a", "id_b").distinct().as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 2L), (1L, 5L)), s"got $pairs")
    } finally query.stop()
  }
}
