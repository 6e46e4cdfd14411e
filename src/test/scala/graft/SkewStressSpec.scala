package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** The skew story under actual skew: a 1000:1 hot key must either be
  * split by AQE's skew-join or spread across salt buckets by
  * Skew.saltedJoin — and salting must stay a pure optimization
  * (row-identical to the plain join).
  */
class SkewStressSpec extends SparkSpec {
  import spark.implicits._

  // ~1000:1 hot key: key 0 carries 100k rows, keys 1..100 carry ~100 each
  private def skewed = spark.range(0, 110000).select(
    when(col("id") < 100000L, 0L).otherwise(pmod(col("id"), lit(100L)) + 1L).as("k"),
    col("id").as("v"),
    // fat payload so the hot partition crosses AQE's byte thresholds
    concat_ws("", (1 to 8).map(_ => md5(col("id").cast("string"))): _*).as("pad"))

  private def dim = spark.range(0, 101).select(col("id").as("k"), (col("id") * 10).as("w"))

  test("saltedJoin is row-identical to the plain join under 1000:1 skew") {
    val plain = skewed.join(dim, Seq("k")).select(col("k"), col("v"), col("w"))
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .select(col("k"), col("v"), col("w"))
    assert(plain.count() == 110000L)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting spreads the hot key across multiple tasks; unsalted funnels it through one") {
    def hotKeyPartitions(df: org.apache.spark.sql.DataFrame): Long = df
      .withColumn("pid", spark_partition_id())
      .filter(col("k") === 0L)
      .select("pid").distinct().count()
    // disable AQE partition coalescing so partition ids reflect the shuffle
    withSql("spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val unsalted = skewed.join(dim.hint("shuffle_hash"), Seq("k"))
      assert(hotKeyPartitions(unsalted) == 1L,
        "without salting the hot key should land in exactly one shuffle partition")
      val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      assert(hotKeyPartitions(salted) >= 4L,
        "salting should spread the hot key across most of its 8 salt buckets")
    }
  }

  test("AQE skew-join splits the hot partition of a sort-merge join") {
    withSql(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true") {
      // one row per key on the right (output stays 110k rows) with
      // broadcast disabled, so SMJ is chosen and only the LEFT side's
      // hot partition trips the skew thresholds
      val right = spark.range(0, 101).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = skewed.join(right, Seq("k"))
      // collect() executes THIS dataset's QueryExecution, finalizing AQE
      assert(joined.collect().length == 110000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the sort-merge join as skew-split; plan:\n${plan.take(2000)}")
    }
  }

  private def withSql[T](confs: (String, String)*)(body: => T): T = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
