package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Accuracy gates for the sketch family at the BENCH scale factor (sf0.1)
  * — unit fixtures prove semantics; these prove the error bounds hold on
  * real data volumes, where sparse→dense promotions and bucket collisions
  * actually occur. Both sketches are deterministic given the data (fixed
  * md5 / fixed HLL seeds), so these are regression gates, not flaky
  * statistical tests.
  */
class SketchAccuracySfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.1"

  test("HLL estimates stay within 3 sigma of exact distinct counts at sf0.1") {
    val lgK = 12
    val sigma = 1.04 / math.sqrt((1 << lgK).toDouble)
    val events = graft.sources.Tables.read(spark, sf, "events")
    val est = Sketches.estimate(
      Sketches.distinctSketchPartials(events, Seq("event_type"), "user_id", lgK))
    val exact = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n_exact"))
    val rows = est.join(exact, "event_type")
      .select(col("event_type"), col("n_distinct_est"), col("n_exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, x) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val rel = math.abs(e - x) / x
      assert(rel <= 3 * sigma,
        s"HLL rel error $rel for ${r.getString(0)} exceeds ${3 * sigma} (exact=$x est=$e)")
    }
  }

  test("HLL merged shard partials stay within bounds of the exact whole-table count at sf0.1") {
    val lgK = 12
    val sigma = 1.04 / math.sqrt((1 << lgK).toDouble)
    val events = graft.sources.Tables.read(spark, sf, "events")
      .withColumn("shard", pmod(col("event_id"), lit(8)))
    // per-shard partials -> union-merge, vs one exact global distinct
    val partials = Sketches.distinctSketchPartials(
      events.withColumn("g", lit(1)), Seq("g", "shard"), "user_id", lgK)
      .drop("shard").withColumnRenamed("g", "k")
      .select(col("k"), col("sketch"))
    val merged = Sketches.estimate(Sketches.mergeSketchPartials(partials, Seq("k")))
    val est = merged.collect()(0).getLong(1).toDouble
    val exact = events.select(count_distinct(col("user_id"))).collect()(0).getLong(0).toDouble
    val rel = math.abs(est - exact) / exact
    assert(rel <= 3 * sigma, s"merged-HLL rel error $rel (exact=$exact est=$est)")
  }

  test("count-min never undercounts and heavy-hitter overestimates respect e*N/width at sf0.1") {
    val depth = 5
    val width = 4096
    val docs = graft.sources.Tables.documents(spark, sf)
    val terms = docs.select(explode(
      expr("filter(split(lower(text), '[^a-z]+'), x -> x != '')")).as("term"))
    val sketch = Sketches.countMinTable(terms, "term", depth, width).localCheckpoint(false)
    val exact = terms.groupBy("term").agg(count(lit(1)).as("n_exact"))
      .orderBy(desc("n_exact")).limit(50).localCheckpoint(false)
    val n = terms.count().toDouble
    val bound = math.E * n / width // per-row CMS overcount bound, pr >= 1 - e^-depth
    val rows = Sketches.countMinEstimate(sketch, exact, "term", depth, width)
      .join(exact, col("i") === col("term"))
      .select(col("i"), col("est"), col("n_exact"))
      .collect()
    // the synthetic vocabulary is small; gate on everything it has
    assert(rows.length >= 20)
    rows.foreach { r =>
      val (est, x) = (r.getLong(1), r.getLong(2))
      assert(est >= x, s"CMS undercounted ${r.getString(0)}: est=$est exact=$x")
      assert(est - x <= bound,
        s"CMS overcount ${est - x} for ${r.getString(0)} exceeds e*N/width=$bound")
    }
  }
}
