package graft

import graft.operators.{Evaluation, Hypothesis, Rolling, Stats}
import org.apache.spark.sql.functions._

/** Round-10 batch Z: partial correlation, peak detection, runs test,
  * gains table, Burrows' Delta.
  */
class Round10fOpsSpec extends SparkSpec {
  import spark.implicits._

  test("partialCorrelation: y = x survives any control; y = z is fully explained") {
    val rows = Seq((1.0, 1.0, 3.0), (2.0, 2.0, 1.0), (3.0, 3.0, 2.0), (4.0, 4.0, 5.0))
    val got = Stats.partialCorrelation(rows.toDF("x", "y", "z"), "x", "y", "z").collect()(0)
    assert(got.getAs[Double]("r_xy") == 1.0)
    assert(got.getAs[Double]("r_xy_given_z") == 1.0)
    val dup = Seq((1.0, 3.0, 3.0), (2.0, 1.0, 1.0), (3.0, 2.0, 2.0), (4.0, 5.0, 5.0))
    val r2 = Stats.partialCorrelation(dup.toDF("x", "y", "z"), "x", "y", "z").collect()(0)
    assert(r2.getAs[Double]("r_yz") == 1.0)
    assert(r2.isNullAt(r2.fieldIndex("r_xy_given_z")),
      "controlling for z == y leaves nothing to correlate — NULL, not 0/0")
  }

  test("detectPeaks: a strict interior spike above the rolling baseline; endpoints never flag") {
    val df = Seq(0.0, 0.0, 5.0, 0.0, 9.0).zipWithIndex
      .map { case (v, i) => ("u", i.toLong, i.toLong, v) }.toDF("u", "t", "id", "v")
    val got = Rolling.detectPeaks(df, Seq("u"), "t", "id", "v", k = 3, minProminence = 2.0)
      .collect()
    assert(got.length == 1, "t=4 (value 9) is an endpoint and cannot be a peak")
    assert(got(0).getAs[Long]("t") == 2L)
    assert(got(0).getAs[Double]("baseline") == 0.0)
    assert(got(0).getAs[Double]("prominence") == 5.0)
  }

  test("runsTest: alternation scores positive z, blocks score negative") {
    def df(vs: Seq[Double]) = vs.zipWithIndex
      .map { case (v, i) => ("g", i.toLong, i.toLong, v) }.toDF("g", "t", "id", "v")
    val alt = Hypothesis.runsTest(
      df(Seq(1.0, 10.0, 2.0, 9.0, 3.0, 8.0, 4.0, 7.0, 5.0, 6.0)),
      Seq("g"), "t", "id", "v").collect()(0)
    assert(alt.getAs[Long]("n_ties_dropped") == 1L, "the median value itself drops")
    assert(alt.getAs[Long]("runs") == 8L,
      "B A B A B A B A A: the trailing above-pair merges into one run")
    assert(alt.getAs[Double]("z") > 1.5)
    val block = Hypothesis.runsTest(
      df((1 to 10).map(_.toDouble)), Seq("g"), "t", "id", "v").collect()(0)
    assert(block.getAs[Long]("runs") == 2L)
    assert(block.getAs[Double]("z") < -2.0)
  }

  test("gainsTable: a perfectly ranked score captures positives fastest") {
    val df = (1 to 10).map(i => ("g", (11 - i).toDouble, i <= 5, i.toLong))
      .toDF("g", "score", "y", "id")
    val got = Evaluation.gainsTable(df, Seq("g"), "score", col("y"), "id", nBins = 5)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(got(1L).getAs[Long]("n") == 2L && got(1L).getAs[Long]("n_pos") == 2L)
    assert(got(1L).getAs[Double]("cum_capture") == 0.4)
    assert(got(1L).getAs[Double]("cum_lift") == 2.0)
    assert(got(5L).getAs[Double]("cum_capture") == 1.0)
    assert(got(5L).getAs[Double]("cum_lift") == 1.0)
  }

  test("burrowsDelta: identical styles are distance 0; a divergent one is not") {
    val docs = Seq(("a", "x y"), ("b", "x y"), ("c", "x x x x"))
      .toDF("source", "text")
    val got = graft.text.Lexical.burrowsDelta(docs, "source", nWords = 5)
      .collect().map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Double]("delta")).toMap
    assert(got(("a", "b")) == 0.0)
    assert(got(("a", "c")) > 1.0)
    assert(got(("a", "c")) == got(("b", "c")))
  }
}
