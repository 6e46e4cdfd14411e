package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trending items: top-k items per time bucket by event count — the
  * "what spiked this hour/day" roll-up over a telemetry or crawl
  * stream. Composition of a bucketed count and a per-bucket rank,
  * kept here because the SHAPE is the point: counts partial-aggregate
  * map-side to (bucket × item) cells, and the rank window partitions
  * by bucket over that cell frame — never over the facts. Nothing
  * larger than buckets × items ever crosses an exchange after the
  * first count shuffle.
  */
object Trending {

  /** (bucket, item, n, rnk): the k highest-count items per bucket,
    * rnk 1-based, ties broken by item value so the cut is
    * deterministic and engine-portable (row_number, not rank — a tie
    * at the boundary keeps exactly k rows). Null times and items are
    * excluded. bucket = floor(epoch_us / bucketUs) — exact integer
    * math.
    */
  def topItemsPerBucket(
      events: DataFrame,
      timeCol: String,
      itemCol: String,
      bucketUs: Long,
      k: Int): DataFrame = {
    require(bucketUs > 0 && k > 0, s"bad bucketUs=$bucketUs k=$k")
    val t = unix_micros(col(timeCol))
    val counts = events
      .filter(col(timeCol).isNotNull && col(itemCol).isNotNull)
      .groupBy(((t - pmod(t, lit(bucketUs))) / bucketUs).cast("long").as("bucket"),
        col(itemCol).as("item"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rnk",
        row_number().over(Window.partitionBy("bucket").orderBy(col("n").desc, col("item"))))
      .filter(col("rnk") <= k)
  }
}
