package graft

import graft.meds.Meds
import graft.operators._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import java.sql.Timestamp

/** Property-style checks over generated cohorts (SURVEY §6): structural
  * invariants that must hold for ANY input, complementing the fixture
  * specs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val cohortGen: Gen[List[(Long, Option[Timestamp], String, Option[Double])]] = {
    val row = for {
      p <- Gen.choose(1L, 12L)
      t <- Gen.option(Gen.choose(0L, 400L).map(d => new Timestamp(1577836800000L + d * 3600 * 1000)))
      c <- Gen.oneOf("HR", "RR", "BP//sys", "DOB", "LAB//na")
      v <- Gen.option(Gen.choose(-50.0, 150.0))
    } yield (p, t, c, v)
    Gen.listOfN(300, row)
  }

  private def sample() = cohortGen.sample.get
    .toDF("patient_id", "time", "code", "numeric_value")

  test("patient filters are monotone in k and never invent rows") {
    val df = sample().cache()
    try {
      val n = df.count()
      val k2 = Filters.filterPatientsByNumMeasurements(df, 10)
      val k1 = Filters.filterPatientsByNumMeasurements(df, 5)
      assert(k2.count() <= k1.count() && k1.count() <= n)
      assert(k2.except(k1).count() == 0) // stricter result ⊆ looser result
      val e2 = Filters.filterPatientsByNumEvents(df, 10)
      val e1 = Filters.filterPatientsByNumEvents(df, 5)
      assert(e2.except(e1).count() == 0)
    } finally df.unpersist()
  }

  test("occludeOutliers preserves row count and only nulls flagged values") {
    val df = sample()
    val meta = CodeMetadata.aggregate(df)
    val out = Outliers.occludeOutliers(df, meta, stddevCutoff = 1.0).cache()
    try {
      assert(out.count() == df.count())
      // every non-null output value is an inlier and appears unchanged
      assert(out.filter(col("numeric_value").isNotNull &&
        !col("numeric_value/is_inlier")).count() == 0)
    } finally out.unpersist()
  }

  test("aggregate counts are consistent: values/n_occurrences <= code/n_occurrences, min <= max") {
    val meta = CodeMetadata.aggregate(sample())
    assert(meta.filter(col(CodeMetadata.ValuesNOccurrences) > col(CodeMetadata.CodeNOccurrences)).count() == 0)
    assert(meta.filter(col(CodeMetadata.ValuesNPatients) > col(CodeMetadata.CodeNPatients)).count() == 0)
    assert(meta.filter(col(CodeMetadata.ValuesMin) > col(CodeMetadata.ValuesMax)).count() == 0)
  }

  test("tokenization preserves measurement counts (dynamic rows = sum of event list sizes)") {
    val df = sample()
    val dynamicRows = df.filter(col("time").isNotNull).count()
    val seqs = Tokenize.seqOfPatientEvents(df)
    val total = seqs.select(sum(aggregate(
      transform(col("code"), e => size(e)), lit(0), (a, x) => a + x)).cast("long")).as[Long].head()
    assert(total == dynamicRows)
  }

  test("aggregate with modifier columns + rollup keeps only full-key and grand-total rows") {
    val df = sample().withColumn("unit", when(col("code").startsWith("LAB"), "mmol").otherwise("raw"))
    val out = CodeMetadata.aggregate(df, codeModifiers = Seq("unit"), summarizeOverAllCodes = true)
    val perKey = df.select("code", "unit").distinct().count()
    assert(out.count() == perKey + 1) // no intermediate rollup levels survive
    val total = out.filter(col("code").isNull && col("unit").isNull)
    assert(total.count() == 1)
    assert(total.select(col(CodeMetadata.CodeNOccurrences)).as[Long].head() == df.count())
  }

  test("finalizeData is idempotent") {
    val once = Meds.finalizeData(sample())
    val twice = Meds.finalizeData(once)
    assert(once.schema == twice.schema)
    assert(once.except(twice).count() == 0)
  }
}
