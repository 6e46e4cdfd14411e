package graft

/** Scratch probe (not a test): print the physical plan of one query at a
  * given sf dir — `Test/runMain graft.ExplainProbe <name> <dir>`.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val (name, dir) = (args(0), if (args.length > 1) args(1) else "/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"=== $name @ $dir ===")
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
