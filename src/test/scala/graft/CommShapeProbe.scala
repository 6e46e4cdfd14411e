package graft

import org.apache.spark.sql.functions._

/** Dev probe (not a test): A/B the q_communities co-purchase edge builder.
  *
  * Shape A (current, round-10 winner): lineitem self-join on l_orderkey
  * with pk< pk, then groupBy(a, b).count. Shape B (re-opened by the
  * round-13 streaming pair generator): groupBy(ok) -> sort_array
  * (collect_list(pk)) -> Pairs.pairs -> filter(a < b) -> groupBy(a, b)
  * .count — ONE corpus exchange and no sort-merge join, but it was
  * measured SLOWER in round 10 when the pair explosion was the
  * interpreted orderedPairs HOF (43.2 s vs 25.4 s at sf10).
  *
  * Equivalence: collect_list keeps per-order pk multiplicity; pairs from
  * the sorted multiset with a strict a < b filter are exactly the join's
  * (x.pk < y.pk) row pairs, so per-(a,b) counts match (verified by the
  * checksum printed per shape).
  *
  *   Test/runMain graft.CommShapeProbe [dir...]
  */
object CommShapeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SessionDefaults.applyTo(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/repo/testdata_sf10")
    // COMMSHAPE_SHAPES=A,C skips the rest (B at sf100 would be a
    // half-hour of already-adjudicated losing shape)
    val shapes = sys.env.getOrElse("COMMSHAPE_SHAPES", "A,B,C").split(",").map(_.trim).toSet
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"COMMSHAPE $tag ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    for (dir <- dirs; rep <- 1 to 2) {
      val li = graft.sources.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      def check(df: org.apache.spark.sql.DataFrame): Unit = {
        val r = df.agg(count(lit(1)), expr("bit_xor(xxhash64(a, b, w))")).collect()(0)
        println(s"COMMSHAPE   rows=${r.getLong(0)} checksum=${r.getLong(1)}")
      }
      val shapeA = li.as("x")
        .join(li.as("y"), col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
      if (shapes("A")) time(s"A join $dir rep$rep")(check(shapeA))
      val grouped = li.groupBy(col("ok")).agg(sort_array(collect_list(col("pk"))).as("pks"))
      val shapeB = graft.functions.Pairs.pairs(grouped, col("pks"), "a", "b")
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
      if (shapes("B")) time(s"B collect+gen $dir rep$rep")(check(shapeB))
      // Shape C (round-13 continuation): same join as A, but the pair
      // stream is repartitioned on (a, b) BEFORE the groupBy. The count's
      // partial aggregate then runs post-exchange (EnsureRequirements
      // elides the agg's own exchange), so the map side never builds the
      // near-unique-key hash map whose sort fallback was the measured
      // 40 GB sf100 spill; the exchange carries the raw 16-byte pair rows
      // it was already carrying (the partial agg shrank almost nothing:
      // 29.5 GB shuffle either way).
      val shapeC = li.as("x")
        .join(li.as("y"), col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b"))
        .repartition(col("a"), col("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
      if (shapes("C")) time(s"C pre-exchange $dir rep$rep")(check(shapeC))
    }
    spark.stop()
  }
}
