package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for the relational and cohort tables.
  *
  * Bucketing pre-clusters a table by its join/aggregation key at WRITE
  * time: every downstream equi-join or groupBy on the bucket key reads
  * co-partitioned data and skips the exchange entirely. At 100 TB this is
  * the difference between shuffling the fact table once per query and
  * never shuffling it at all — the one-time bucketed write is amortized
  * across every patient-keyed stage (filters, tokenization, reorder) or
  * orderkey join (q3-style) that follows.
  *
  * Uses Spark's native parquet bucketing (`bucketBy` + `sortBy` +
  * `saveAsTable`): each bucket is hash-assigned by the key, files carry
  * the bucket id, and the scan reports `HashPartitioning(key, n)` so
  * Catalyst drops the `Exchange` on both sides of a same-bucketing join.
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table.
    * Buckets on a cluster should be sized so one bucket ≈ one task's
    * memory budget (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket across
    * files, split further by parquet row groups).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    df.write
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Register the TPC-H join tables bucketed on their join keys:
    * lineitem and orders share `orderkey` bucketing (the fact-fact join
    * of q3/top-customers becomes exchange-free); customer stays a
    * broadcast dimension and is not bucketed.
    */
  def bucketTpch(spark: SparkSession, dir: String, buckets: Int = 8, prefix: String = "b_"): Unit = {
    writeBucketed(Tables.lineitem(spark, dir), s"${prefix}lineitem", buckets, Seq("l_orderkey"))
    writeBucketed(Tables.orders(spark, dir), s"${prefix}orders", buckets, Seq("o_orderkey"))
  }

  /** Register the events cohort bucketed by patient: every per-patient
    * stage downstream (filter_patients, tokenization, reorder) then
    * aggregates or windows without a shuffle.
    */
  def bucketEventsByPatient(spark: SparkSession, dir: String, buckets: Int = 8, table: String = "b_events"): Unit =
    writeBucketed(Tables.events(spark, dir), table, buckets, Seq("user_id"))

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
