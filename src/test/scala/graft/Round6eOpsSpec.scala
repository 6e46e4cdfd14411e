package graft

import graft.ann.ClusterQuality
import graft.operators.Stats
import org.apache.spark.sql.functions._

/** Round-6 fifth batch: Hill tail index, simplified silhouette,
  * Davies–Bouldin cluster quality.
  */
class Round6eOpsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- hillTailIndex

  test("hillTailIndex: recovers a Pareto tail exponent") {
    // exact Pareto order statistics: x_(i) = (n/i)^(1/alpha), i-th largest.
    // Hill over the top k then estimates alpha with small bias at n=500.
    val alpha = 2.0
    val n = 500
    val rows = (1 to n).map(i => ("g", i.toLong, math.pow(n.toDouble / i, 1.0 / alpha)))
    val df = rows.toDF("g", "id", "x")
    val r = Stats.hillTailIndex(df, Seq("g"), "x", "id", k = 50).collect().head
    assert(r.getAs[Long]("n") == n.toLong)
    // x_tail is the 51st largest = (500/51)^(1/2)
    assert(math.abs(r.getAs[Double]("x_tail") - math.pow(n / 51.0, 0.5)) < 1e-9)
    // closed form: mean_{i<=50} ln(x_(i)/x_(51)) = (1/alpha) * mean ln(51/i)
    val expected = 1.0 / ((1 to 50).map(i => math.log(51.0 / i)).sum / 50.0 / alpha)
    assert(math.abs(r.getAs[Double]("alpha") - expected) < 1e-3,
      s"got ${r.getAs[Double]("alpha")}, want ~$expected")
    assert(math.abs(r.getAs[Double]("alpha") - alpha) < 0.5, "in the right ballpark")
  }

  test("hillTailIndex: small / constant / non-positive groups emit NULL alpha") {
    val small = (1 to 20).map(i => ("s", i.toLong, i.toDouble))
    val const = (1 to 60).map(i => ("c", i.toLong, 7.0))
    val mixed = (1 to 60).map(i => ("m", i.toLong, if (i <= 55) -1.0 else i.toDouble))
    val df = (small ++ const ++ mixed).toDF("g", "id", "x")
    val out = Stats.hillTailIndex(df, Seq("g"), "x", "id", k = 50)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    // fewer than k+1 rows: no tail threshold at all
    assert(out("s").getAs[Long]("n") == 20L && out("s").isNullAt(out("s").fieldIndex("x_tail")))
    assert(out("s").isNullAt(out("s").fieldIndex("alpha")))
    // constant tail: x_tail = 7 but every log ratio is 0 -> NULL alpha
    assert(out("c").getAs[Double]("x_tail") == 7.0)
    assert(out("c").isNullAt(out("c").fieldIndex("alpha")))
    // non-positive values are excluded BEFORE ranking: only 5 survive in m
    assert(out("m").getAs[Long]("n") == 5L)
    assert(out("m").isNullAt(out("m").fieldIndex("alpha")))
  }

  test("hillTailIndex: duplicate values rank deterministically by id") {
    val dup = (1 to 60).map(i => ("g", i.toLong, if (i <= 55) 10.0 else 100.0))
    val r = Stats.hillTailIndex(dup.toDF("g", "id", "x"), Seq("g"), "x", "id", k = 50)
      .collect().head
    // 5 rows of 100 then 46 rows of 10 in the top-51: x_tail = 10
    assert(r.getAs[Double]("x_tail") == 10.0)
    // mean of 5*ln(10) + 45*0 over 50 > 0 -> alpha defined
    val expected = 1.0 / (5.0 * math.log(10.0) / 50.0)
    assert(math.abs(r.getAs[Double]("alpha") - expected) < 1e-3)
  }

  // ------------------------------------------------------- cluster quality

  private val centroids2d = Seq(
    (0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 0.0))
  ).toDF("cid", "centroid")

  test("silhouette: tight well-separated clusters score near 1") {
    val pts = Seq(
      (1L, Seq(0.1f, 0.0f)), (2L, Seq(-0.1f, 0.0f)),
      (3L, Seq(10.1f, 0.0f)), (4L, Seq(9.9f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = ClusterQuality.silhouette(pts, centroids2d)
      .collect().map(r => r.getAs[Long]("cid") -> r).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L).getAs[Long]("n") == 2L && out(1L).getAs[Long]("n") == 2L)
    // d1 = 0.1, d2 ~ 9.9..10.1: s = (d2-d1)/d2 ~ 0.99
    assert(math.abs(out(0L).getAs[Double]("mean_d1") - 0.1) < 1e-6)
    assert(out(0L).getAs[Double]("mean_sil") > 0.98)
    assert(out(1L).getAs[Double]("mean_sil") > 0.98)
  }

  test("silhouette: a boundary point scores 0") {
    val pts = Seq((1L, Seq(5.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = ClusterQuality.silhouette(pts, centroids2d).collect().head
    assert(r.getAs[Long]("cid") == 0L, "equidistant ties to the lower cid")
    assert(r.getAs[Double]("mean_sil") == 0.0)
  }

  test("daviesBouldin: hand-computed two-cluster ratio") {
    // cluster 0 members at distance 1 and 3 (S_0 = 2); cluster 1 members
    // at distance 2 and 2 (S_1 = 2); separation M = 10
    val pts = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(-3.0f, 0.0f)),
      (3L, Seq(12.0f, 0.0f)), (4L, Seq(8.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = ClusterQuality.daviesBouldin(pts, centroids2d)
      .collect().map(r => r.getAs[Long]("cid") -> r).toMap
    assert(math.abs(out(0L).getAs[Double]("s_c") - 2.0) < 1e-6)
    assert(math.abs(out(0L).getAs[Double]("db") - 0.4) < 1e-6)
    assert(math.abs(out(1L).getAs[Double]("db") - 0.4) < 1e-6)
  }

  test("daviesBouldin: single cluster has no ratio; empty cells emit no row") {
    val one = Seq((0L, Seq(0.0, 0.0))).toDF("cid", "centroid")
    val pts = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = ClusterQuality.daviesBouldin(pts, one).collect().head
    assert(r.isNullAt(r.fieldIndex("db")))
    // two centroids, all points near centroid 0: cid 1 gets no row
    val skew = Seq((1L, Seq(0.5f, 0.0f)), (2L, Seq(-0.5f, 0.0f))).toDF("vec_id", "embedding")
    val cids = ClusterQuality.daviesBouldin(skew, centroids2d)
      .select("cid").as[Long].collect().toSet
    assert(cids == Set(0L))
  }
}
