package graft

import graft.operators.Validate
import graft.operators.Validate.Expectation
import org.apache.spark.sql.functions._

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq[(java.lang.Long, String, java.lang.Double)](
    (1L, "a", 1.0),
    (2L, "b", -3.0),
    (null, "a", 2.0),
    (4L, null, null)
  ).toDF("id", "cat", "v")

  private val rules = Seq(
    Expectation("id_present", col("id").isNotNull),
    Expectation("v_nonneg", col("v") >= 0),
    Expectation("cat_known", col("cat").isin("a", "b"))
  )

  test("violations: one row per rule, null predicate counts as violation") {
    val out = Validate.violations(df, rules)
      .select("rule", "n_rows", "n_violations")
      .as[(String, Long, Long)].collect().map { case (r, n, v) => r -> ((n, v)) }.toMap
    assert(out("id_present") == ((4L, 1L)))
    assert(out("v_nonneg") == ((4L, 2L))) // -3 fails, null v fails (unevaluable)
    assert(out("cat_known") == ((4L, 1L)))
  }

  test("violations runs as ONE aggregation over one scan") {
    val plan = Validate.violations(df, rules).queryExecution.executedPlan.toString
    val head = plan.split("== Initial Plan ==")(0)
    assert(head.split("HashAggregate|SortAggregate|ObjectHashAggregate").length - 1 <= 2,
      s"expected a single partial+final aggregate pair:\n$head")
  }

  test("failingRows tags rows with the sorted failed-rule list") {
    val out = Validate.failingRows(df, rules)
      .select("id", "failed_rules").as[(Option[Long], String)].collect().toSet
    assert(out == Set(
      (Some(2L), "v_nonneg"),
      (None, "id_present"),
      (Some(4L), "cat_known,v_nonneg")))
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Validate.violations(df, Seq(
        Expectation("x", col("id").isNotNull), Expectation("x", col("v") >= 0)))
    }
  }

  test("contentChecksum: order-free, change-sensitive, null-aware") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val shuffled = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("id", "v")
    def ck(df: org.apache.spark.sql.DataFrame): String =
      Validate.contentChecksum(df, Seq.empty, Seq("id", "v"))
        .collect().head.getAs[String]("checksum")
    assert(ck(a) == ck(shuffled), "row order cannot move the sum")
    assert(ck(a) != ck(a.withColumn("v", when(col("id") === 2L, lit("Y")).otherwise(col("v")))),
      "a one-character edit moves it")
    // NULL vs empty string are different contents
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("id", "v")
    val withEmpty = Seq((1L, "")).toDF("id", "v")
    assert(ck(withNull) != ck(withEmpty))
  }

  test("contentChecksum: delimiter and sentinel collisions cannot mask a change") {
    import spark.implicits._
    def ck(df: org.apache.spark.sql.DataFrame): String =
      Validate.contentChecksum(df, Seq.empty, Seq("a", "b"))
        .collect().head.getAs[String]("checksum")
    // a boundary shift: ('a|b','c') vs ('a','b|c') — identical unescaped joins
    assert(ck(Seq(("a|b", "c")).toDF("a", "b")) != ck(Seq(("a", "b|c")).toDF("a", "b")))
    // a literal string that spells any NULL sentinel is not NULL
    assert(ck(Seq(("\\N", "x")).toDF("a", "b"))
      != ck(Seq((null.asInstanceOf[String], "x")).toDF("a", "b")))
    // escape char itself round-trips unambiguously
    assert(ck(Seq(("a\\", "|b")).toDF("a", "b")) != ck(Seq(("a", "\\|b")).toDF("a", "b")))
  }
}
