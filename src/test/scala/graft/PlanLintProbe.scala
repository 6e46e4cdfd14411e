package graft

import graft.plans.PlanLint

/** Scratch probe (not a test): print every lint finding across the whole
  * query surface so the CI allowlist can be built from evidence.
  */
object PlanLintProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        PlanLint.lint(fn(spark, sf)).foreach(f => println(s"[probe] $name ${f.rule} :: ${f.node}"))
      } catch { case e: Throwable => println(s"[probe] $name ERR ${e.getMessage}") }
    }
    println("[probe] done")
    spark.stop()
  }
}
