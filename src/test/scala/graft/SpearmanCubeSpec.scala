package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

class SpearmanCubeSpec extends SparkSpec {
  import spark.implicits._

  test("spearman is 1 for any monotone relation, -1 for reversed") {
    val mono = (1 to 50).map(i => ("g", i.toDouble, math.exp(i / 10.0))).toDF("g", "x", "y")
    val rho = Stats.spearman(mono, Seq("g"), "x", "y").head().getAs[Double]("rho")
    assert(math.abs(rho - 1.0) < 1e-9)
    val rev = (1 to 50).map(i => ("g", i.toDouble, -math.exp(i / 10.0))).toDF("g", "x", "y")
    val rho2 = Stats.spearman(rev, Seq("g"), "x", "y").head().getAs[Double]("rho")
    assert(math.abs(rho2 + 1.0) < 1e-9)
  }

  test("spearman handles ties via average ranks") {
    // x has ties; a known small example: x = (1,2,2,3), y = (1,3,2,4)
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 3.0), ("g", 2.0, 2.0), ("g", 3.0, 4.0))
      .toDF("g", "x", "y")
    val rho = Stats.spearman(df, Seq("g"), "x", "y").head().getAs[Double]("rho")
    // ranks x: 1, 2.5, 2.5, 4; y: 1, 3, 2, 4 -> pearson of those = 0.9487...
    assert(math.abs(rho - 0.9486832980505138) < 1e-9)
  }

  test("spearman ignores outliers that wreck pearson") {
    val base = (1 to 30).map(i => ("g", i.toDouble, i.toDouble))
    val out = base :+ (("g", 31.0, 1e9)) // huge y outlier, still monotone up at the end? no: break it
    val df = out.toDF("g", "x", "y")
    val rho = Stats.spearman(df, Seq("g"), "x", "y").head().getAs[Double]("rho")
    val pear = Stats.groupedCorrelation(df, Seq("g"), "x", "y").head().getAs[Double]("corr")
    assert(math.abs(rho - 1.0) < 1e-9) // rank-wise still perfectly monotone
    assert(pear < 0.7)                 // pearson dragged by the outlier
  }
}
