package graft

import org.apache.spark.sql.functions._

/** Dev probe (not a test): does the shingle df drop-cap actually BIND
  * at a given corpus size, and how much pair volume does it remove?
  *
  * The `maxDocFreq = 1000` cap in [[graft.dedup.Dedup.commonShinglePairs]]
  * is what keeps the bucket self-join sub-quadratic, but below ~sf100 no
  * benchmark shingle reaches df 1000, so the code path that makes
  * `q_dedup_jaccard`/`q_containment` scale-safe never fires on the
  * driver's data. This probe measures, at any dir:
  *   - the 5-gram df histogram tail (df > cap count, max df);
  *   - the in-bucket pair volume Σ df·(df−1)/2 WITH and WITHOUT the cap
  *     (the work the self-join would have done);
  *   - the corpus-relative cap [[graft.dedup.Dedup.relativeDocFreqCap]]
  *     would pick at this size, next to the fixed 1000.
  *
  *   Test/runMain graft.CapBindProbe /root/repo/testdata_sf100
  *
  * Prints one JSON line; cap_binds=true means the sf100 bench section's
  * wall times exercise the capped regime.
  */
object CapBindProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf100")
    val cap = args.lift(1).map(_.toLong).getOrElse(1000L)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = graft.sources.Tables.documents(spark, dir)
      val nDocs = docs.count()
      val relCap = graft.dedup.Dedup.relativeDocFreqCap(docs)
      val df5 = docs
        .select(col("doc_id"), graft.text.TextFunctions.wordTokens(col("text")).as("__t"))
        .select(explode(array_distinct(
          graft.functions.ShingleHashes.shingleHashes(col("__t"), 5))).as("sh"))
        .groupBy("sh").agg(count(lit(1)).as("df"))
      val pairVol = col("df") * (col("df") - 1) / 2
      val r = df5.agg(
        count(lit(1)).as("n_shingles"),
        max(col("df")).as("max_df"),
        count(when(col("df") > cap, lit(1))).as("n_over_cap"),
        sum(pairVol).cast("decimal(38,0)").cast("double").as("pairs_uncapped"),
        sum(when(col("df") <= cap, pairVol)).cast("decimal(38,0)").cast("double")
          .as("pairs_capped")
      ).collect().head
      val over = r.getAs[Long]("n_over_cap")
      println(
        s"""{"metric":"cap_bind","dir":"$dir","n_docs":$nDocs,"cap":$cap,""" +
          s""""relative_cap":$relCap,"n_shingles":${r.getAs[Long]("n_shingles")},""" +
          s""""max_df":${r.getAs[Long]("max_df")},"n_over_cap":$over,""" +
          s""""pairs_uncapped":${r.getAs[Double]("pairs_uncapped")},""" +
          s""""pairs_capped":${r.getAs[Double]("pairs_capped")},""" +
          s""""cap_binds":${over > 0}}""")
    } finally spark.stop()
  }
}
