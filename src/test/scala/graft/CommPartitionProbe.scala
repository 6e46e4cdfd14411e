package graft

import org.apache.spark.sql.functions._

/** Dev probe (not a test): does the sf100 q_communities 40 GB in-stage
  * aggregation spill respond to the AQE pre-coalesce width
  * (`spark.sql.adaptive.coalescePartitions.initialPartitionNum`)? The
  * bench session fixes 256; at sf100 the co-purchase self-join's partial
  * aggregates see ~multi-GB per task at that width. AQE coalesces small
  * sections back, so a wider initial only changes behavior where the
  * data is big — the scale-adaptive knob the guide's §2.3 asks for.
  *
  *   Test/runMain graft.CommPartitionProbe [dir] [width...]
  */
object CommPartitionProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf100")
    val widths = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(256, 1024)
    for (w <- widths) {
      val spark = SessionDefaults.applyTo(org.apache.spark.sql.SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", w.toString)
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false"))
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val gcMs = new java.util.concurrent.atomic.AtomicLong
      val mem = new java.util.concurrent.atomic.AtomicLong
      val disk = new java.util.concurrent.atomic.AtomicLong
      val rd = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            gcMs.addAndGet(m.jvmGCTime); mem.addAndGet(m.memoryBytesSpilled)
            disk.addAndGet(m.diskBytesSpilled); rd.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          }
        }
      })
      try {
        val fn = SparkEntry.queries("q_communities")
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"COMMPART width=$w wall=$sec%.1f s rows=$n gc=${gcMs.get / 1e3}%.1f " +
          f"memSpillGb=${mem.get / 1e9}%.1f diskSpillGb=${disk.get / 1e9}%.1f " +
          f"shuffleReadGb=${rd.get / 1e9}%.1f")
      } finally spark.stop()
    }
  }
}
