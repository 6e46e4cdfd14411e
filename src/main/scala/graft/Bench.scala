package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** The hot subset benchmarked at sf1 (10x the driver's sf0.1): the
    * round-4 heaviest queries plus the full dedup family — the regime
    * where plans, not scheduling, dominate the wall clock.
    */
  val HotQueries: Seq[String] = Seq(
    "q1_pricing", "q3_shipping", "q_top_customers", "q_asof",
    "q_tokenize_seqs", "q_meds_pipeline", "q_curation",
    "q_dedup_exact", "q_dedup_jaccard", "q_dedup_minhash", "q_dedup_cluster",
    "q_minhash_sigs", "q_simhash_pairs", "q_containment", "q_cross_dedup",
    "q_line_dedup", "q_dup_stats", "q_source_sim", "q_leakage", "q_novelty",
    "q_semdedup", "q_pagerank", "q_ann_topk", "q_ann_ivf_kmeans",
    // round-5 additions to the shingle/graph families
    "q_cdc_chunks", "q_winnow", "q_kcore")
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the bench tables are single parquet files; at the default 128 MiB
      // split size a 100 MiB lineitem scans as ONE task and every
      // zero-shuffle pipeline runs serial until its first exchange. 8 MiB
      // emulates the multi-file layout any real dataset has.
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JVM/codegen/file-listing costs land here, not in the timings.
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach { t =>
        try graft.sources.Tables.read(spark, sfDir, t).count()
        catch { case _: Throwable => () }
      }
    // Optional comma-separated subset for local iteration; the driver
    // leaves this unset and benches everything.
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").map(_.trim).toSet)
    def runAll(dir: String, subset: Option[Set[String]]): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => subset.forall(_.contains(name)) }
        .map { case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, dir).count() }
          catch { case e: Throwable =>
            // loud on stderr — a swallowed failure reads as a fast query
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
          val elapsed = (System.nanoTime() - t0) / 1e9
          // drop this query's localCheckpoint blocks NOW: queries never
          // share frames, and relying on GC + ContextCleaner lets 140+
          // queries of dead blocks pile up — measured 17x degradation on
          // the heavy dedup queries late in a full-session run
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
          name -> elapsed
        }
    val results = runAll(sfDir, only)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Per-query map goes to a side file (and an earlier stdout line): with 140+
    // queries the combined JSON overflows the driver's tail capture, leaving the
    // headline unparseable (round-4 verdict). The FINAL line is compact,
    // total-only, and always parseable.
    // sf1 section: when the 10x scaled dataset exists, bench the hot
    // subset there too — the plan-dominated regime (round-4 verdict: at
    // sf0.1 every query is scheduler-bound).
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/testdata_sf1")
    val sf1Results =
      if (only.isEmpty && new java.io.File(s"$sf1Dir/lineitem.parquet").exists()) {
        // reap the sf0.1 section's localCheckpoint blocks before the 10x
        // section: their RDD references are dead but unpersist happens via
        // the ContextCleaner on GC — 140+ queries of retained blocks
        // otherwise GC-thrash the heavier sf1 queries (measured 4x on the
        // jaccard pipeline late in a long session)
        System.gc()
        Thread.sleep(2000)
        runAll(sf1Dir, Some(HotQueries.toSet))
      } else Nil
    val sf1Qs = sf1Results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sf1Total = sf1Results.map(_._2).sum
    val perQuery =
      s"""{"metric":"per_query","queries":$qs,"sf":"$sfDir","sf1_queries":$sf1Qs,"sf1_dir":"$sf1Dir"}"""
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_QUERIES.json"),
        perQuery.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    println(perQuery)
    val sf1Part =
      if (sf1Results.isEmpty) ""
      else s""","sf1":{"total":$sf1Total,"n_queries":${sf1Results.size},"dir":"$sf1Dir"}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size}$sf1Part}""")
    spark.stop()
  }
}
