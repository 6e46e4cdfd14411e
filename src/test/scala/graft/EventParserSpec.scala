package graft

import graft.meds.Meds
import graft.operators.EventParser._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class EventParserSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("lab", "HR", Some(70.0), Some("bpm")),
    ("lab", "RR", Some(18.0), None),
    ("note", "ADMIT", None, None)
  ).toDF("kind", "name", "value", "unit")

  test("matcher is a conjunction of equalities; empty matcher matches all") {
    assert(filterByMatcher(df, Map("kind" -> "lab")).count() == 2)
    assert(filterByMatcher(df, Map("kind" -> "lab", "name" -> "HR")).count() == 1)
    assert(filterByMatcher(df, Map.empty).count() == 3)
  }

  test("Str interpolation concatenates literals and columns, null-propagating") {
    val out = df.select(toColumn(Str("{kind}//{name}//{unit}")).as("c")).as[String].collect()
    assert(out.contains("lab//HR//bpm"))
    assert(out.count(_ == null) == 2) // null unit nulls the whole string (pl.format semantics)
  }

  test("FirstValid coalesces; Guarded applies matcher-conditional output") {
    val expr = FirstValid(Seq(
      Guarded(Map("kind" -> "lab"), Col("value")),
      Literal(0.0)
    ))
    val out = df.select(col("name"), toColumn(expr).as("v")).as[(String, Double)].collect().toMap
    assert(out == Map("HR" -> 70.0, "RR" -> 18.0, "ADMIT" -> 0.0))
  }

  test("finalizeMetadata retypes and wraps scalar parent_codes in a list") {
    val meta = Seq((1, 42, Some(3.2), "x")).toDF("code", "description", "parent_codes", "foo")
    val out = Meds.finalizeMetadata(meta)
    assert(out.schema("code").dataType == StringType)
    assert(out.schema("description").dataType == StringType)
    assert(out.schema("parent_codes").dataType == ArrayType(StringType))
    val r = out.collect()(0)
    assert(r.getString(0) == "1" && r.getString(1) == "42")
    assert(r.getSeq[String](2) == Seq("3.2"))
    assert(r.getString(3) == "x") // extras preserved after mandatory
    // missing mandatory columns are injected as nulls
    val minimal = Meds.finalizeMetadata(Seq(("A")).toDF("code"))
    assert(minimal.columns.toSeq == Seq("code", "description", "parent_codes"))
    assert(minimal.collect()(0).isNullAt(1) && minimal.collect()(0).isNullAt(2))
  }
}
