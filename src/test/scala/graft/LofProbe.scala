package graft

/** Dev probe (not a test): fused vs unfused self-kNN LOF variants at a
  * given SF dir — documents that the fused path is warm-identical and
  * its fresh-JVM first run pays ~4 s extra whole-stage codegen. */
import org.apache.spark.sql.functions._
object LofProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Tables.read(spark, dir, "embeddings")
    e.count()
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"LOFPROBE $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$r")
    }
    t("fused nBits=8 (current)")(graft.ann.Lof.selfProbeLof(e, 5, 8, 1).count())
    t("fused nBits=8 again")(graft.ann.Lof.selfProbeLof(e, 5, 8, 1).count())
    t("fused nBits=7")(graft.ann.Lof.selfProbeLof(e, 5, 7, 1).count())
    t("old path nBits=7") {
      val cand = graft.ann.Lof.selfProbeCandidates(e, nBits = 7, probeRadius = 1)
      graft.ann.Lof.lofWithCandidates(e, 5, cand, pairsDistinct = true).count()
    }
    t("old path nBits=8") {
      val cand = graft.ann.Lof.selfProbeCandidates(e, nBits = 8, probeRadius = 1)
      graft.ann.Lof.lofWithCandidates(e, 5, cand, pairsDistinct = true).count()
    }
    spark.stop()
  }
}
