package graft

import graft.ann.KMeans
import graft.functions.VectorSum.vectorSum
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** Two well-separated blobs around (0,0) and (10,10). */
  private lazy val blobs = Seq(
    (1L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)), (3L, Array(-0.1f, 0.1f)),
    (4L, Array(10.0f, 9.9f)), (5L, Array(9.9f, 10.1f)), (6L, Array(10.1f, 10.0f))
  ).toDF("vec_id", "embedding")

  test("vectorSum sums element-wise map-side, skips nulls, rejects mixed dims") {
    val df = Seq(
      (1L, Array(1.0, 2.0)), (1L, Array(3.0, 4.0)), (2L, Array(5.0, 6.0))
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(vectorSum(col("v")).as("s"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(out(1L) == Seq(4.0, 6.0) && out(2L) == Seq(5.0, 6.0))
    val withNull = Seq((1L, Some(Array(1.0))), (1L, None)).toDF("g", "v")
    assert(withNull.groupBy("g").agg(vectorSum(col("v")).as("s"))
      .select("s").as[Seq[Double]].collect().toSeq == Seq(Seq(1.0)))
    val mixed = Seq((1L, Array(1.0)), (1L, Array(1.0, 2.0))).toDF("g", "v")
    intercept[Exception](mixed.groupBy("g").agg(vectorSum(col("v"))).collect())
  }

  test("initCentroids: k rows, cids 0..k-1, partitioning-independent") {
    val a = KMeans.initCentroids(blobs, 3).select("cid").as[Long].collect().sorted.toSeq
    assert(a == Seq(0L, 1L, 2L))
    val b = KMeans.initCentroids(blobs.repartition(5), 3)
      .as[(Long, Seq[Double])].collect().toMap
    val c = KMeans.initCentroids(blobs, 3).as[(Long, Seq[Double])].collect().toMap
    assert(b == c)
  }

  test("fit recovers the two blob centers and assignment separates them") {
    val centroids = KMeans.fit(blobs, k = 2, iters = 3)
    val assigned = KMeans.assign(blobs, centroids)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    // one cluster holds {1,2,3}, the other {4,5,6}
    assert(Set(assigned(1L), assigned(2L), assigned(3L)).size == 1)
    assert(Set(assigned(4L), assigned(5L), assigned(6L)).size == 1)
    assert(assigned(1L) != assigned(4L))
    val cs = centroids.as[(Long, Seq[Double])].collect().map(_._2)
    assert(cs.exists(c => math.abs(c.head) < 0.5 && math.abs(c(1)) < 0.5))
    assert(cs.exists(c => math.abs(c.head - 10) < 0.5 && math.abs(c(1) - 10) < 0.5))
  }

  test("fit: mean within-cluster distance does not increase with iterations") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def wcss(iters: Int): Double =
      KMeans.assign(e, KMeans.fit(e, k = 8, iters = iters))
        .agg(avg("dist")).as[Double].head()
    val w = (0 to 2).map(wcss)
    assert(w(1) <= w(0) + 1e-9 && w(2) <= w(1) + 1e-9, s"WCSS increased: $w")
  }

  test("IvfIO: round-trip index search matches in-memory ivfTopK and prunes partitions") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 10)
    val centroids = KMeans.fit(e, k = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    graft.ann.IvfIO.write(e, centroids, dir)
    val fromIndex = graft.ann.IvfIO.search(spark, dir, q, k = 5, nProbe = 2)
    val inMemory = KMeans.ivfTopK(e, q, centroids, k = 5, nProbe = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(rows(fromIndex) == rows(inMemory))
    // probed-cell literal filter reaches the scan as a partition filter
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cid"), s"no partition pruning in plan:\n$plan")
  }

  test("ivfTopK: every query gets k rows and recall grows with nProbe") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 20)
    val centroids = KMeans.fit(e, k = 16, iters = 2)
    def rset(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect().toSet
    val exact = rset(graft.ann.Similarity.bruteForceTopK(e, q, k = 5))
    val p1 = rset(KMeans.ivfTopK(e, q, centroids, k = 5, nProbe = 1))
    val p4 = rset(KMeans.ivfTopK(e, q, centroids, k = 5, nProbe = 4))
    assert(p4.groupBy(_._1).forall(_._2.size == 5))
    def recall(s: Set[(Long, Long)]) = (s intersect exact).size.toDouble / exact.size
    assert(recall(p4) >= recall(p1), s"recall(p4)=${recall(p4)} < recall(p1)=${recall(p1)}")
  }
}
