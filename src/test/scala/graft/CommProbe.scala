package graft

import org.apache.spark.sql.functions._

/** Dev probe (not a test): explain q_communities' sf10 scaling — how do
  * the co-purchase edge frame and the LPA rounds grow with the corpus?
  *
  *   Test/runMain graft.CommProbe
  */
object CommProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/repo/testdata_sf1", "/root/repo/testdata_sf10")
    for (dir <- dirs) {
      val li = graft.sources.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val nLi = li.count()
      val pairs = li.as("x")
        .join(li.as("y"), col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
        .agg(count(lit(1)).as("w"))
      val nPairs = pairs.count()
      val nEdges = pairs.filter(col("w") >= 2).count()
      println(s"COMM dir=$dir lineitem=$nLi distinct_pairs=$nPairs edges_w2=$nEdges")
    }
    spark.stop()
  }
}
