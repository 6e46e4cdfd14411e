package graft

import graft.dedup.Dedup
import graft.operators.{Debounce, Impute, Profile, Sketches, Stats}
import graft.text.FeatureHash
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class Round4bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("debounce keeps the first of a burst and events after the gap") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "click", 1L),
      (2L, ts("2024-01-01 00:00:30"), "click", 1L), // within 1min of #1 -> drop
      (3L, ts("2024-01-01 00:02:00"), "click", 1L), // 90s after #2 -> keep
      (4L, ts("2024-01-01 00:00:10"), "view", 1L),  // other type untouched
      (5L, null.asInstanceOf[Timestamp], "click", 1L) // null time passes through
    ).toDF("event_id", "ts", "event_type", "user_id")
    val kept = Debounce.debounce(df, Seq("user_id", "event_type"), "ts", 60000000L, "event_id")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("debounce simultaneous duplicates: lowest tie survives") {
    val df = Seq(
      (7L, ts("2024-01-01 00:00:00"), "click", 1L),
      (6L, ts("2024-01-01 00:00:00"), "click", 1L)
    ).toDF("event_id", "ts", "event_type", "user_id")
    val kept = Debounce.debounce(df, Seq("user_id", "event_type"), "ts", 60000000L, "event_id")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(6L))
  }

  test("mean imputation fills from group mean, leaves empty groups null") {
    val df = Seq(
      ("a", Some(2.0)), ("a", Some(4.0)), ("a", None),
      ("b", None), ("b", None)
    ).toDF("code", "v")
    val out = Impute.meanImpute(df, Seq("code"), "v")
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getAs[Long]("v/imputed")))
    val aFilled = out.filter(r => r._1 == "a" && r._3 == 1L)
    assert(aFilled.length == 1 && aFilled.head._2.contains(3.0))
    assert(out.filter(_._1 == "b").forall(r => r._2.isEmpty && r._3 == 0L))
    assert(out.count(r => r._1 == "a" && r._3 == 0L) == 2)
  }

  test("mean imputation treats a NULL group key as a real group") {
    val df = Seq(
      (Option("a"), Some(2.0)),
      (Option.empty[String], Some(6.0)), (Option.empty[String], Some(8.0)),
      (Option.empty[String], Option.empty[Double])
    ).toDF("code", "v")
    val out = Impute.meanImpute(df, Seq("code"), "v")
      .filter(col("code").isNull).collect()
      .map(r => (Option(r.get(1)), r.getAs[Long]("v/imputed")))
    assert(out.count(_._2 == 1L) == 1)
    assert(out.find(_._2 == 1L).get._1.contains(7.0)) // NULL group's own mean
  }

  test("count-min estimates upper-bound exact counts, tight at large width") {
    val df = (1 to 1000).map(i => s"k${i % 37}").toDF("k")
    val exact = df.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = Sketches.countMinTable(df, "k", 4, 1024)
    val est = Sketches.countMinEstimate(sk, df, "k", 4, 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) => assert(est(k) >= n) }
    // 37 keys in 1024 buckets x 4 rows: expect no collisions at all
    assert(exact.forall { case (k, n) => est(k) == n })
  }

  test("count-min partials merge additively") {
    val a = Seq("x", "x", "y").toDF("k")
    val b = Seq("x", "z").toDF("k")
    val merged = Sketches.countMinMerge(
      Sketches.countMinTable(a, "k", 2, 64).unionAll(Sketches.countMinTable(b, "k", 2, 64)))
    val est = Sketches.countMinEstimate(merged, a.unionAll(b), "k", 2, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("x") == 3L && est("y") == 1L && est("z") == 1L)
  }

  test("chi-square: independent columns give ~zero, dependent give mass") {
    // perfectly dependent: a == b
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y")).toDF("a", "b")
    val chi = Stats.chiSquare(dep, "a", "b").agg(sum("chi2")).head().getDouble(0)
    assert(math.abs(chi - 4.0) < 1e-9) // chi2 = N for a 2x2 perfect association
    // independent uniform
    val ind = (for { a <- Seq("x", "y"); b <- Seq("u", "v") } yield (a, b)).toDF("a", "b")
    val chiInd = Stats.chiSquare(ind, "a", "b").agg(sum("chi2")).head().getDouble(0)
    assert(math.abs(chiInd) < 1e-9)
  }

  test("quantile summary matches R-7 on a known set") {
    val df = (1 to 5).map(i => ("g", i.toDouble)).toDF("g", "v")
    val qs = Profile.quantileSummary(df, Seq("g"), "v", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(qs == Map(0.25 -> 2.0, 0.5 -> 3.0, 0.75 -> 4.0))
  }

  test("feature hashing is deterministic, bounded by dim, signed") {
    val df = Seq((1L, "alpha beta alpha"), (2L, "alpha beta alpha")).toDF("doc_id", "text")
    val out = FeatureHash.hashedFeatures(df, "doc_id", "text", 16).collect()
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(
      _.map(r => (r.getLong(1), r.getLong(2))).toSet).toMap
    assert(byDoc(1L) == byDoc(2L)) // same text -> identical features
    // total absolute mass <= token count (signs may cancel)
    assert(byDoc(1L).toSeq.map(_._2.abs).sum <= 3)
  }

  test("cross-split leakage reports only boundary-crossing near-dups") {
    val txt = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq(
      (1L, txt, "train"), (2L, txt, "eval"),   // cross-split dup -> reported
      (3L, txt + " x", "train"),                // near-dup of 1 in SAME split
      (10L, "completely different content words here for the other cluster", "eval")
    ).toDF("doc_id", "text", "split")
    val out = Dedup.crossSplitLeakage(df, "split", threshold = 0.5, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)))
    assert(!out.contains((1L, 3L)))
    assert(out.forall { case (a, b) => Set(a, b) != Set(1L, 3L) })
  }
}
