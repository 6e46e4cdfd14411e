package graft

import graft.operators.{Hypothesis, Trend}
import graft.ann.Embeddings
import org.apache.spark.sql.functions._

/** Round-10 batch AA: Hurst exponent, Friedman test, Cochran's Q,
  * geometric median.
  */
class Round10gOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("hurstExponent: a pure trend reads persistent, alternation anti-persistent") {
    val trendy = (0 until 128).map(i => ("up", t(i.toLong), i.toLong, i.toDouble))
    val alt = (0 until 128).map(i => ("alt", t(i.toLong), i.toLong,
      if (i % 2 == 0) 0.0 else 1.0))
    val df = (trendy ++ alt).toDF("g", "ts", "id", "v")
    val got = Trend.hurstExponent(df, Seq("g"), "ts", "id", "v",
      blockSizes = Seq(8, 16, 32, 64))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(got("up").getAs[Long]("k_sizes") == 4L)
    assert(got("up").getAs[Double]("hurst") > 0.85,
      "a deterministic ramp is maximally persistent")
    assert(got("alt").getAs[Double]("hurst") < 0.2,
      "strict alternation is maximally anti-persistent")
  }

  test("friedman: unanimous treatment ordering maxes the statistic; incomplete raises") {
    // 4 blocks, 3 treatments, treatment c always highest, a always lowest:
    // rank sums 4, 8, 12 -> Q = 12/(4*3*4)*(16+64+144) - 3*4*4 = 8
    val rows = for (b <- 0 until 4; (tr, v) <- Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)))
      yield ("g", b.toLong, tr, v + b * 10)
    val got = Hypothesis.friedman(rows.toDF("g", "blk", "tr", "v"),
      Seq("g"), "blk", "tr", "v").collect()(0)
    assert(got.getAs[Long]("n_blocks") == 4L && got.getAs[Long]("k_treatments") == 3L)
    assert(got.getAs[Double]("q") == 8.0)
    assert(got.getAs[Long]("df") == 2L)
    val e = intercept[Exception] {
      Hypothesis.friedman(rows.drop(1).toDF("g", "blk", "tr", "v"),
        Seq("g"), "blk", "tr", "v").collect()
    }
    assert(e.getMessage != null)
  }

  test("cochranQ: one treatment flagging everything stands out; constant subjects are NULL") {
    // 4 subjects x 3 treatments; treatment c hits all 4, a and b hit none
    val rows = for (s <- 0 until 4; tr <- Seq("a", "b", "c"))
      yield ("g", s.toLong, tr, tr == "c")
    val got = Hypothesis.cochranQ(rows.toDF("g", "s", "tr", "h"),
      Seq("g"), "s", "tr", col("h")).collect()(0)
    // C = (0,0,4), T=4, R_i=1 each: Q = 2*(3*16-16)/(3*4-4) = 8
    assert(got.getAs[Double]("q") == 8.0)
    val const = rows.map { case (g, s, tr, _) => (g, s, tr, true) }
    val r2 = Hypothesis.cochranQ(const.toDF("g", "s", "tr", "h"),
      Seq("g"), "s", "tr", col("h")).collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("q")), "every subject constant -> no information")
  }

  test("geometricMedian: an outlier drags the mean but barely the median") {
    val base = (0 until 20).map { i =>
      (1, (0 until 64).map(d => if (d == 0) 1.0f else 0.0f))
    }
    val outlier = Seq((1, (0 until 64).map(d => if (d == 0) 1000.0f else 0.0f)))
    val df = (base ++ outlier).toDF("label", "embedding")
    val got = Embeddings.geometricMedian(df, "label", "embedding", iterations = 5)
      .collect()(0)
    val med = got.getSeq[Double](got.fieldIndex("median"))
    assert(med(0) < 2.0,
      s"median dim0 = ${med(0)}: the 1000-outlier must not drag the anchor " +
        "(the mean would sit at ~48.6)")
    assert(med.drop(1).forall(_ == 0.0))
    assert(got.getAs[Long]("n") == 21L)
  }
}
