package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Dev probe (not a test): explain the run-to-run variance of a heavy
  * bench query (round-8 verdict: q_curation sf10 samples 34–61 s,
  * max/min 1.8×). Runs one query N times in the EXACT bench
  * configuration (fresh session per run, the runIsolated conf) with a
  * task-metrics listener, printing per-run wall time next to shuffle
  * memory/disk spill, GC time, and shuffle read/write volume — if slow
  * runs carry proportionally more spill/GC the variance is
  * memory-pressure noise on a shared box, not a plan property.
  *
  *   Test/runMain graft.SpillProbe /root/repo/testdata_sf10 q_curation 3
  *
  * Trailing `key=value` args become session conf overrides — e.g. pass
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold=128` to
  * replay the pre-round-13 sort-fallback behavior against the now-
  * default raised threshold (SessionDefaults, applied here exactly as
  * in the bench sessions).
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf10")
    val query = args.lift(1).getOrElse("q_curation")
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val overrides = args.drop(3).filter(_.contains("="))
      .map { a => val Array(k, v) = a.split("=", 2); k -> v }
    val runs = (1 to n).map { i =>
      val b = org.apache.spark.sql.SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      SessionDefaults.applyTo(b)
      overrides.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val memSpill = new AtomicLong; val diskSpill = new AtomicLong
      val gc = new AtomicLong; val shRead = new AtomicLong; val shWrite = new AtomicLong
      val listener = new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            memSpill.addAndGet(m.memoryBytesSpilled)
            diskSpill.addAndGet(m.diskBytesSpilled)
            gc.addAndGet(m.jvmGCTime)
            shRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(query)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      val out = Map(
        "run" -> i, "sec" -> f"$sec%.1f", "rows" -> rows,
        "mem_spill_gb" -> f"${memSpill.get / 1e9}%.1f",
        "disk_spill_gb" -> f"${diskSpill.get / 1e9}%.1f",
        "gc_sec" -> f"${gc.get / 1e3}%.1f",
        "shuffle_read_gb" -> f"${shRead.get / 1e9}%.1f",
        "shuffle_write_gb" -> f"${shWrite.get / 1e9}%.1f")
      println(s"SPILLPROBE $query " + out.map { case (k, v) => s"$k=$v" }.mkString(" "))
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      (sec, diskSpill.get, gc.get)
    }
    val secs = runs.map(_._1)
    println(f"SPILLPROBE summary min=${secs.min}%.1f max=${secs.max}%.1f ratio=${secs.max / secs.min}%.2f")
  }
}
