package graft

import graft.plans.PlanLint
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private val df = (1L to 100L).map(i => (i, i % 5, i * 1.0)).toDF("id", "k", "v")

  test("flags a partition-less window, accepts the partitioned one") {
    val global = df.withColumn("rn", row_number().over(Window.orderBy("v")))
    assert(PlanLint.lint(global).exists(_.rule == "global-window"))
    val keyed = df.withColumn("rn", row_number().over(Window.partitionBy("k").orderBy("v")))
    assert(!PlanLint.lint(keyed).exists(_.rule == "global-window"))
  }

  test("a global window below a limit is top-k postprocessing, not a finding") {
    val topk = df.orderBy(desc("v")).limit(5)
      .withColumn("rn", row_number().over(Window.orderBy(desc("v"))))
    assert(!PlanLint.lint(topk).exists(_.rule == "global-window"))
  }

  test("flags cartesian products and single-partition exchanges") {
    val cross = df.crossJoin(df.select(col("id").as("id2")))
    assert(PlanLint.lint(cross).exists(f => f.rule == "cartesian" || f.rule == "nested-loop-join"))
    assert(PlanLint.lint(df.repartition(1).groupBy("k").count())
      .exists(_.rule == "single-partition-exchange"))
  }

  test("every SparkEntry query stays lint-clean (modulo documented allowances)") {
    val sf = "/root/testdata/sf0.001"
    // vocab-sized-by-contract global windows, documented in VERDICT/SURVEY
    val allowed = Set("q_fit_vocab", "q_normalize", "q_meds_pipeline")
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (allowed(name)) Nil
      else PlanLint.lint(fn(spark, sf))
        .filter(_.rule == "global-window") // the hard at-scale killer
        .map(f => s"$name: $f")
    }
    assert(bad.isEmpty, s"lint findings:\n${bad.mkString("\n")}")
  }
}
