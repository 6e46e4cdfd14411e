package graft

import graft.operators.Seasonal
import org.apache.spark.sql.functions._

/** Round-8 operators: the composed seasonality stack (dominant period →
  * decompose-at-winner).
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  private def hourly(key: String, vals: Seq[Int]) =
    vals.zipWithIndex.flatMap { case (n, h) =>
      Seq.fill(n)((key, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(3600L * h))))
    }.toDF("k", "ts")

  test("decomposeAtDominant: each key decomposes at ITS OWN measured period") {
    // key a: 12h square wave; key b: 8h square wave — 4 days each
    val a = hourly("a", (0 until 96).map(h => if (h % 12 < 6) 5 else 1))
    val b = hourly("b", (0 until 96).map(h => if (h % 8 < 4) 7 else 2))
    val out = Seasonal.decomposeAtDominant(a.union(b), "k", "ts",
      periods = Seq(6, 8, 12, 24))
    val byKey = out.groupBy("key").agg(max("period").as("p"), min("period").as("p2"))
      .collect().map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("p"), r.getAs[Long]("p2"))).toMap
    assert(byKey("a") == (12L, 12L), s"key a must decompose at 12, got ${byKey("a")}")
    assert(byKey("b") == (8L, 8L), s"key b must decompose at 8, got ${byKey("b")}")
    // the seasonal component actually carries the cycle: high-phase
    // hours of key a sit above low-phase hours by ~the wave amplitude
    val aSeas = out.filter(col("key") === "a")
      .select(col("phase"), col("seasonal")).distinct()
      .collect().map(r => r.getAs[Long]("phase") -> r.getAs[Double]("seasonal")).toMap
    val hi = (0L to 5L).map(aSeas).sum / 6
    val lo = (6L to 11L).map(aSeas).sum / 6
    assert(hi - lo > 3.0, s"12h seasonal amplitude missing: hi=$hi lo=$lo")
  }

  test("decomposeAtDominant: matches plain decompose when the period is the winner") {
    val a = hourly("a", (0 until 96).map(h => if (h % 12 < 6) 5 else 1))
    val composed = Seasonal.decomposeAtDominant(a, "k", "ts", periods = Seq(8, 12, 24))
      .drop("period")
    val direct = Seasonal.decompose(a, "k", "ts", period = 12)
    assert(composed.exceptAll(direct).isEmpty && direct.exceptAll(composed).isEmpty,
      "composed branch at the winning period must equal decompose(winner)")
  }

  test("decomposeAtDominant: entropy + zero-mass gates drop untrustworthy keys") {
    // w: one clean 12h cycle -> spectral mass concentrates on one
    // candidate (entropy near 0). split: EQUAL 8h + 12h cycles -> mass
    // splits across two candidates (entropy ~ ln2/ln4 = 0.5). const:
    // zero spectral mass everywhere -> no cycle AT ALL (power_share
    // NULL; entropy 0 must not read as "concentrated").
    val wave = hourly("w", (0 until 96).map(h => if (h % 12 < 6) 9 else 1))
    val split = hourly("s", (0 until 96).map(h =>
      (if (h % 12 < 6) 4 else 0) + (if (h % 8 < 4) 4 else 0) + 1))
    val const = hourly("c", Seq.fill(96)(3))
    val out = Seasonal.decomposeAtDominant(wave.union(split).union(const), "k", "ts",
      periods = Seq(6, 8, 12, 24), maxEntropy = 0.3)
    val keys = out.select("key").distinct().as[String].collect().toSet
    assert(keys == Set("w"),
      s"split-spectrum and constant keys must be dropped, got $keys")
    // with a looser gate the split key comes back; the constant key never does
    val loose = Seasonal.decomposeAtDominant(wave.union(split).union(const), "k", "ts",
      periods = Seq(6, 8, 12, 24), maxEntropy = 0.8)
    val looseKeys = loose.select("key").distinct().as[String].collect().toSet
    assert(looseKeys == Set("w", "s"), s"got $looseKeys")
  }

  test("decomposeAtDominant: a sweep-sized candidate list is rejected") {
    val a = hourly("a", (0 until 24).map(_ => 1))
    intercept[IllegalArgumentException] {
      Seasonal.decomposeAtDominant(a, "k", "ts", periods = (2 to 26))
    }
  }
}
