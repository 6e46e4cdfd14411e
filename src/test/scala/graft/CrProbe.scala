package graft

import org.apache.spark.sql.functions._

/** Dev probe (not a test): stage-level cost breakdown of
  * q_capture_recapture at a given SF dir — where do the seconds go
  * (signature projection, band/bucket machinery, cosine verify, the
  * full-outer Chapman join)?
  *
  *   Test/runMain graft.CrProbe /root/repo/testdata_sf1
  */
object CrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.plans.Materialize.PinOps
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CRPROBE $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = graft.sources.Tables.read(spark, dir, "embeddings")
    t("warmup count")(emb.count())
    val pinned = emb.select(col("vec_id").as("id"), col("embedding").as("__v")).pin(false)
    t("pin vectors")(pinned.count())
    def bits(seed: String, tag: String) =
      graft.ann.Srp.planes(16, 64, seed).toSeq.zipWithIndex.map { case (pl, p) =>
        when(graft.functions.GraftFunctions.dotProduct(col("__v"), typedLit(pl)) >= 0.0,
          lit(1)).otherwise(lit(0)).as(s"__${tag}_$p")
      }
    val sigsBoth = pinned.select(
      col("id") +: (bits("cr1", "a") ++ bits("cr2", "b")): _*).pin(false)
    t("sigsBoth (32 dots/row)")(sigsBoth.count())
    def candOf(tag: String) = graft.dedup.Dedup.minhashCandidatePairs(
      sigsBoth.select(
        col("id") +: (0 until 16).map(p => col(s"__${tag}_$p").as(s"minhash_$p")): _*),
      16, 4, 1000)
    val candA = t("candidates A")(candOf("a").pin(false))
    t("cand A count")(println("  candA rows=" + candA.count()))
    def verify(cand: org.apache.spark.sql.DataFrame) = cand
      .join(pinned.select(col("id").as("id_a"), col("__v").as("__va")), "id_a")
      .join(pinned.select(col("id").as("id_b"), col("__v").as("__vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.Portable.r6(
          graft.ann.Similarity.cosine(col("__va"), col("__vb"))).as("cosine"))
      .filter(col("cosine") >= 0.25)
    t("verify A")(println("  pairsA rows=" + verify(candA).count()))
    val candB = t("candidates B")(candOf("b").pin(false))
    t("verify B")(println("  pairsB rows=" + verify(candB).count()))
    t("WHOLE captureRecapture")(
      graft.ann.Srp.captureRecapture(emb, 0.25, "cr1", "cr2").collect()
        .foreach(println))
    spark.stop()
  }
}
