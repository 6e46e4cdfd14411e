package graft

import org.apache.spark.sql.functions._

/** Scratch probe (not a test): time the stages of the shingle/dedup
  * pipeline at a given sf dir to find the dominant cost.
  */
object ShingleProfileProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/testdata_sf1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    docs.count() // warm
    time("scan+count")(docs.count())
    time("tokenize only")(docs.select(graft.text.TextFunctions.wordTokens(col("text")).as("t"))
      .select(size(col("t"))).agg(sum("size(t)")).count())
    time("shingleTable (strings)")(graft.dedup.Dedup.shingleTable(docs, "doc_id", "text", 5).count())
    time("shingleHashTable")(graft.dedup.Dedup.shingleHashTable(docs, "doc_id", "text", 5).count())
    time("commonShinglePairs")(graft.dedup.Dedup.commonShinglePairs(docs, 5, "doc_id", "text", 1000).count())
    time("full jaccard")(graft.dedup.Dedup.ngramJaccardPairs(docs, 0.5, 5).count())
    // bucket-size distribution: where does the pair volume come from?
    val shs = docs
      .select(col("doc_id"), graft.text.TextFunctions.wordTokens(col("text")).as("__t"))
      .select(array_distinct(graft.functions.ShingleHashes.shingleHashes(col("__t"), 5)).as("__s"))
      .select(explode(col("__s")).as("sh"))
    val hist = shs.groupBy("sh").count()
      .select(col("count").as("df"))
      .withColumn("b", floor(log2(col("df"))).cast("long"))
      .groupBy("b").agg(count(lit(1)).as("n_shingles"),
        sum(least(col("df"), lit(1000L)) * least(col("df"), lit(1000L))).as("pair_mass"))
      .orderBy("b")
    hist.collect().foreach(r => println(
      f"[hist] df in 2^${r.getAs[Long]("b")}%2d: ${r.getAs[Long]("n_shingles")}%10d shingles, pair mass ${r.getAs[Long]("pair_mass")}%15d"))
    spark.stop()
  }
}
