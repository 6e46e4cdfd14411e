package graft

import graft.operators.Rolling
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class RollingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val events = Seq(
    // (id, key, time, value)
    (1L, 1L, ts("2024-01-01 10:00:00"), Some(2.0)),
    (2L, 1L, ts("2024-01-01 10:30:00"), None),
    (3L, 1L, ts("2024-01-01 10:59:00"), Some(5.0)),
    (4L, 1L, ts("2024-01-01 12:30:00"), Some(7.0)), // own window only
    (5L, 2L, ts("2024-01-01 10:30:00"), Some(11.0)), // other key
    (6L, 2L, null, Some(99.0)) // static: dropped
  ).toDF("id", "k", "t", "v").withColumn("v", col("v").cast("double"))

  test("trailingAggregates counts and sums the trailing hour per key") {
    val out = Rolling
      .trailingAggregates(events, "k", "t", "v", windowUs = 3600L * 1000000L)
      .select("id", "n_trail", "sum_trail")
      .as[(Long, Long, Double)]
      .collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    assert(out(1L) == ((1L, 2.0)))
    assert(out(2L) == ((2L, 2.0))) // null value counted in n, not sum
    assert(out(3L) == ((3L, 7.0))) // 10:00 still inside [9:59, 10:59]
    assert(out(4L) == ((1L, 7.0))) // previous events aged out
    assert(out(5L) == ((1L, 11.0))) // keys isolated
    assert(!out.contains(6L))
  }

  test("trailingAggregates treats equal timestamps as peers (RANGE frame)") {
    val dup = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, ts("2024-01-01 10:00:00"), 10.0)
    ).toDF("id", "k", "t", "v")
    val out = Rolling
      .trailingAggregates(dup, "k", "t", "v", windowUs = 1000000L)
      .select("id", "n_trail", "sum_trail").as[(Long, Long, Double)].collect()
    // both rows see BOTH peers regardless of intra-peer order
    assert(out.forall { case (_, n, s) => n == 2L && s == 11.0 })
  }

  test("forwardFill carries the last non-null value, not across keys") {
    val out = Rolling
      .forwardFill(events, "k", "t", "id", "v", "filled")
      .select("id", "filled")
      .as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(2.0))
    assert(out(2L).contains(2.0)) // filled from id=1
    assert(out(3L).contains(5.0)) // own value wins
    assert(out(4L).contains(7.0))
    assert(out(5L).contains(11.0)) // never sees key 1's values
  }

  test("resampleLastValue fills gap buckets and carries values forward") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:15:00"), Some(2.0)),
      (2L, 1L, ts("2024-01-01 10:45:00"), Some(4.0)),
      // 11:00 and 12:00 buckets empty
      (3L, 1L, ts("2024-01-01 13:05:00"), None) // event but no value
    ).toDF("id", "k", "t", "v")
    val out = Rolling
      .resampleLastValue(e, "k", "t", "id", "v", stepUs = 3600L * 1000000L)
      .select("bucket_us", "n_events", "value_last")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    val hour = 3600L * 1000000L
    val b0 = out.head._1
    assert(out.map(_._1).toSeq == (0 to 3).map(b0 + _ * hour))
    assert(out.map(_._2).toSeq == Seq(2L, 0L, 0L, 1L))
    // in-bucket last = 4.0 (10:45 beats 10:15), carried through the gap
    // and through the null-valued 13:05 event
    assert(out.map(_._3).toSeq == Seq(Some(4.0), Some(4.0), Some(4.0), Some(4.0)))
  }

  test("resampleLastValue leaves buckets before the first value null") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), None: Option[Double]),
      (2L, 1L, ts("2024-01-01 11:00:00"), Some(7.0))
    ).toDF("id", "k", "t", "v")
    val out = Rolling
      .resampleLastValue(e, "k", "t", "id", "v", stepUs = 3600L * 1000000L)
      .select("n_events", "value_last").as[(Long, Option[Double])].collect().toSet
    assert(out == Set((1L, None), (1L, Some(7.0))))
  }

  test("resampleLastValue fails loudly when a key's grid explodes") {
    val e = Seq(
      (1L, 1L, ts("2000-01-01 00:00:00"), Some(1.0)),
      (2L, 1L, ts("2024-01-01 00:00:00"), Some(2.0))
    ).toDF("id", "k", "t", "v")
    val ex = intercept[Exception] {
      Rolling.resampleLastValue(e, "k", "t", "id", "v",
        stepUs = 1000000L, maxBucketsPerKey = 1000L).collect()
    }
    assert(ex.getMessage.contains("widen stepUs") ||
      Option(ex.getCause).exists(_.getMessage.contains("widen stepUs")))
  }

  test("forwardFill leaves a leading null run null") {
    val lead = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), None: Option[Double]),
      (2L, 1L, ts("2024-01-01 11:00:00"), Some(3.0))
    ).toDF("id", "k", "t", "v")
    val out = Rolling.forwardFill(lead, "k", "t", "id", "v", "filled")
      .select("id", "filled").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(3.0))
  }
}
