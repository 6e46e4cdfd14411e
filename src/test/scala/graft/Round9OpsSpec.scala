package graft

import graft.ann.Embeddings
import graft.operators.{Evaluation, Graph, Integrity, Logistic, Seasonal, Sequences}
import org.apache.spark.sql.functions._

/** Round-9 batch O: B-cubed clustering eval, bounded-hop BFS,
  * sequential pattern support, user-level DP means, trend/seasonal
  * strength, rank-matched ATT, embedding centroid drift.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- bCubed
  test("bCubed: perfect clustering scores 1/1/1; one mega-cluster keeps recall 1") {
    val perfect = Seq(("c1", "a"), ("c1", "a"), ("c2", "b"), ("c2", "b"))
      .toDF("cl", "lb")
    val p = Evaluation.bCubed(perfect, "cl", "lb").collect().head
    assert(p.getAs[Long]("n_items") == 4 && p.getAs[Long]("n_dropped") == 0)
    assert(p.getAs[Double]("bcubed_precision") == 1.0)
    assert(p.getAs[Double]("bcubed_recall") == 1.0)
    assert(p.getAs[Double]("bcubed_f1") == 1.0)
    // everything in ONE cluster: recall 1, precision = sum |class|^2 / N^2
    val mega = Seq(("c", "a"), ("c", "a"), ("c", "a"), ("c", "b"))
      .toDF("cl", "lb")
    val m = Evaluation.bCubed(mega, "cl", "lb").collect().head
    assert(m.getAs[Double]("bcubed_recall") == 1.0)
    assert(math.abs(m.getAs[Double]("bcubed_precision") - (9.0 + 1.0) / 16.0) < 1e-6)
  }

  test("bCubed: null cluster/label rows are dropped and counted") {
    val df = Seq(("c1", "a"), (null, "a"), ("c1", null)).toDF("cl", "lb")
    val r = Evaluation.bCubed(df, "cl", "lb").collect().head
    assert(r.getAs[Long]("n_items") == 1 && r.getAs[Long]("n_dropped") == 2)
  }

  // ----------------------------------------------------------------- kHop
  test("kHopDistances: BFS levels, hop bound, unreachable nodes absent") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y"))
      .toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val got = Graph.kHopDistances(e, seeds, maxHops = 2).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("dist")).toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    // a shorter path wins over a longer rediscovery
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    val g2 = Graph.kHopDistances(tri, seeds, maxHops = 3).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("dist")).toMap
    assert(g2 == Map("a" -> 0L, "b" -> 1L, "c" -> 1L))
    intercept[IllegalArgumentException] {
      Graph.kHopDistances(e, seeds, maxHops = 33)
    }
  }

  // ------------------------------------------------------------ sequences
  test("sequentialPatterns: adjacent motifs, per-user support, joiner guard") {
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      (1L, t(1), "view", 1L), (1L, t(2), "cart", 2L), (1L, t(3), "buy", 3L),
      (2L, t(1), "view", 4L), (2L, t(2), "cart", 5L), (2L, t(3), "buy", 6L),
      (3L, t(1), "view", 7L), (3L, t(2), "view", 8L)
    ).toDF("u", "ts", "et", "id")
    val got = Sequences.sequentialPatterns(ev, "u", "ts", "et", "id", minSupport = 2L)
      .collect().map(r => (r.getAs[String]("pattern"), r.getAs[Long]("len"),
        r.getAs[Long]("n_users"), r.getAs[Long]("n_occurrences"))).toSet
    assert(got == Set(
      ("view>cart", 2L, 2L, 2L),
      ("cart>buy", 2L, 2L, 2L),
      ("view>cart>buy", 3L, 2L, 2L)))
    val bad = Seq((1L, t(1), "a>b", 1L), (1L, t(2), "c", 2L)).toDF("u", "ts", "et", "id")
    val ex = intercept[Exception] {
      Sequences.sequentialPatterns(bad, "u", "ts", "et", "id", 1L).collect()
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .flatMap(t0 => Option(t0.getMessage)).mkString(" | ")
    assert(msgs.contains("joiner"), msgs)
  }

  // -------------------------------------------------------------- dpMeans
  test("dpMeans: clipping binds, release is deterministic, exact count never leaks") {
    val df = Seq(
      ("g", 1L, 10.0), ("g", 1L, 10.0), ("g", 2L, 1000.0), ("g", 3L, -50.0)
    ).toDF("grp", "user", "v")
    // huge epsilon -> negligible noise: mean of per-user clipped means
    // (10, 100 [clip], 0 [clip]) = 36.666667
    val out = Integrity.dpMeans(df, Seq("grp"), "user", "v",
      lo = 0.0, hi = 100.0, epsilon = 1e9, seed = "s")
    assert(!out.columns.contains("n_users"), "exact user count must not be released")
    val r = out.collect().head
    assert(math.abs(r.getAs[Double]("noisy_mean") - 36.666667) < 1e-3)
    val again = Integrity.dpMeans(df, Seq("grp"), "user", "v",
      lo = 0.0, hi = 100.0, epsilon = 0.5, seed = "s").collect().head
    val again2 = Integrity.dpMeans(df, Seq("grp"), "user", "v",
      lo = 0.0, hi = 100.0, epsilon = 0.5, seed = "s").collect().head
    assert(again == again2, "same seed must release identical noise (idempotence)")
    val other = Integrity.dpMeans(df, Seq("grp"), "user", "v",
      lo = 0.0, hi = 100.0, epsilon = 0.5, seed = "s2").collect().head
    assert(other != again, "a different seed must draw different noise")
  }

  // ------------------------------------------------------------- strength
  test("strength: a clean daily cycle scores f_seas near 1; constant series is NULL") {
    // 6 days of hourly events: key "cyc" has a strong 24h pattern
    // (phase-dependent count), key "flat" is constant
    val rows = for {
      day <- 0 until 6; hour <- 0 until 24
      ts = java.sql.Timestamp.valueOf(f"2024-01-0${day + 1} $hour%02d:00:00")
      k <- Seq("cyc", "flat")
      n = if (k == "cyc") 1 + (if (hour < 12) 0 else 9) else 3
      i <- 1 to n
    } yield (k, ts, i)
    val df = rows.toDF("k", "ts", "i")
    val got = Seasonal.strength(df, "k", "ts", period = 24).collect()
      .map(r => r.getAs[String]("key") -> r).toMap
    assert(got("cyc").getAs[Double]("f_seas") > 0.95,
      s"clean cycle must score high, got ${got("cyc")}")
    // a constant series: zero variance anywhere -> NULL strengths
    assert(got("flat").isNullAt(got("flat").fieldIndex("f_seas")))
    assert(got("flat").isNullAt(got("flat").fieldIndex("f_trend")))
  }

  // -------------------------------------------------------- rankMatchedAtt
  test("rankMatchedAtt: rank pairing within bins, surplus dropped, holes visible") {
    val df = Seq(
      // bin 5 (p=0.55): two treated, three control -> 2 pairs, 1 surplus
      (1L, true, 10.0, 0.55), (2L, true, 20.0, 0.55),
      (3L, false, 1.0, 0.55), (4L, false, 2.0, 0.55), (5L, false, 99.0, 0.55),
      // bin 9: treated only -> positivity hole, 0 pairs
      (6L, true, 7.0, 0.95)
    ).toDF("id", "tr", "y", "p")
    val got = Logistic.rankMatchedAtt(df, "id", "y", "tr", "p", nBins = 10)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    val b5 = got(5L)
    assert(b5.getAs[Long]("n_pairs") == 2L)
    // pairs by id rank: (10-1) + (20-2) over 2 = 13.5
    assert(b5.getAs[Double]("att") == 13.5)
    val b9 = got(9L)
    assert(b9.getAs[Long]("n_pairs") == 0L && b9.isNullAt(b9.fieldIndex("att")))
    assert(b9.getAs[Long]("n_treated") == 1L && b9.getAs[Long]("n_control") == 0L)
  }

  // -------------------------------------------------------- centroidDrift
  test("centroidDrift: aligned buckets cos 1, orthogonal cos 0, first bucket NULL") {
    def v(x: Float, y: Float) = Array(x, y, 0f, 0f)
    val rows =
      (0L to 4L).map(i => (i, v(1, 0))) ++ // bucket 0: +x
        (10L to 14L).map(i => (i, v(2, 0))) ++ // bucket 1: +x (same direction)
        (20L to 24L).map(i => (i, v(0, 3))) :+ // bucket 2: +y (orthogonal)
        (25L, Array(0f, 0f, 0f, 0f)) // zero vector: excluded
    val emb = rows.toDF("vec_id", "embedding")
    val got = Embeddings.centroidDrift(emb, bucketWidth = 10L).collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(got(0L).isNullAt(got(0L).fieldIndex("drift_cos")), "first bucket has no prev")
    assert(got(0L).getAs[Long]("n_vecs") == 5L)
    assert(got(1L).getAs[Double]("drift_cos") == 1.0)
    assert(got(2L).getAs[Double]("drift_cos") == 0.0)
    assert(got(2L).getAs[Long]("n_vecs") == 5L, "zero vector must be excluded")
    assert(got(0L).getAs[Double]("centroid_norm") == 1.0, "aligned unit vectors: |centroid| = 1")
  }
}
