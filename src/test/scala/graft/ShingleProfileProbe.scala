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
    spark.stop()
  }
}
