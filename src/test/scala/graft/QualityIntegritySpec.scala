package graft

import graft.operators.{Integrity, Stats}
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Round-5 batch: C4 line rules, PII redaction, encoding artifacts,
  * PSI drift, FK-integrity audit.
  */
class QualityIntegritySpec extends SparkSpec {
  import spark.implicits._

  test("c4Rules keeps punctuated >=3-word lines and flags boilerplate") {
    val df = Seq(
      (1L, "This is a sentence.\nshort.\nAnother good line here!\nno terminal punct\nA third full line stands here.\nA fourth proper line is kept.\nAnd a fifth complete line ends well."),
      (2L, "lorem ipsum dolor sit amet."),
      (3L, "function f() { return 1; }\nThis would otherwise be a fine line.")
    ).toDF("doc_id", "text")
    val out = df
      .select(col("doc_id"), TextFunctions.c4Rules(col("text")).as("c"))
      .select(col("doc_id"), col("c.n_lines"), col("c.n_kept"), col("c.has_lorem"), col("c.has_brace"), col("c.passes"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    // doc 1: 7 lines; "short." (1 word) and "no terminal punct" fail -> 5 kept -> passes
    assert(out(1L) == ((7L, 5L, false, false, true)))
    assert(out(2L) == ((1L, 1L, true, false, false)))
    assert(out(3L)._4 && !out(3L)._5)
  }

  test("c4Rules agrees across \\r\\n and \\n line endings") {
    val df = Seq(
      (1L, "A good line sits here.\r\nAnother good line here.\r\n"),
      (2L, "A good line sits here.\nAnother good line here.\n")
    ).toDF("doc_id", "text")
    val rows = df
      .select(TextFunctions.c4Rules(col("text")).getField("n_kept").as("k"))
      .collect()
      .map(_.getLong(0))
    assert(rows.toSeq == Seq(2L, 2L))
  }

  test("redactPii replaces emails, IPs and long digit runs, counting each") {
    val out = Seq((1L, "mail a@b.com or 10.0.0.1 ref 123456789 done"))
      .toDF("doc_id", "text")
      .select(TextFunctions.redactPii(col("text")).as("r"))
      .select(col("r.redacted"), col("r.n_redacted"))
      .head()
    assert(out.getString(0) == "mail <EMAIL> or <IP> ref <NUM> done")
    assert(out.getLong(1) == 3L)
  }

  test("redactPii does not double-count digit runs inside emails") {
    val out = Seq((1L, "contact user123456789@example.com now"))
      .toDF("doc_id", "text")
      .select(TextFunctions.redactPii(col("text")).as("r"))
      .select(col("r.redacted"), col("r.n_redacted"))
      .head()
    assert(out.getString(0) == "contact <EMAIL> now")
    assert(out.getLong(1) == 1L)
  }

  test("encodingArtifacts counts replacement/control/mojibake chars") {
    val out = Seq((1L, "ok � bad  Ã© â€œquoteâ€"), (2L, "clean text"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.encodingArtifacts(col("text")).as("a"))
      .select(col("doc_id"), col("a.n_replacement"), col("a.n_ctrl"), col("a.n_mojibake"), col("a.is_clean"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) == ((1L, 1L, 3L, false)))
    assert(out(2L) == ((0L, 0L, 0L, true)))
  }

  test("psi is near zero for identical halves and large for shifted ones") {
    val same = (1 to 2000).map(i => (i.toLong, "a", (i % 100).toDouble))
    val shifted = (1 to 2000).map { i =>
      // even ids (reference): values 0..49; odd ids: 50..99 -> disjoint
      val v = if (i % 2 == 0) (i % 50).toDouble else 50.0 + (i % 50).toDouble
      (i.toLong, "b", v)
    }
    val df = (same ++ shifted).toDF("event_id", "event_type", "value")
    val out = Stats
      .psi(df, Seq("event_type"), "value", isRef = col("event_id") % 2 === 0)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(math.abs(out("a")) < 0.01, s"identical halves should have ~0 PSI, got ${out("a")}")
    assert(out("b") > 1.0, s"disjoint halves should have large PSI, got ${out("b")}")
  }

  test("psi handles a constant column (single bin) without NaN") {
    val df = (1 to 100).map(i => (i.toLong, "c", 5.0)).toDF("event_id", "event_type", "value")
    val out = Stats.psi(df, Seq("event_type"), "value", col("event_id") % 2 === 0).head()
    assert(!out.getDouble(1).isNaN && math.abs(out.getDouble(1)) < 1e-9)
  }

  test("fkAudit counts orphans and null FKs per relation") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val row = Integrity.fkAudit("child.fk", child, "fk", parent, "pk").head()
    assert(row.getString(0) == "child.fk")
    assert(row.getLong(1) == 4L) // n_rows
    assert(row.getLong(2) == 1L) // n_null_fk
    assert(row.getLong(3) == 1L) // n_orphans (9L)
    assert(row.getDouble(4) == 0.25)
  }

  test("fkAuditAll unions one row per relation") {
    val p1 = Seq(1L).toDF("pk")
    val c1 = Seq(1L, 2L).toDF("fk")
    val out = Integrity.fkAuditAll(Seq(
      ("r1", c1, "fk", p1, "pk"),
      ("r2", p1.withColumnRenamed("pk", "fk"), "fk", c1.withColumnRenamed("fk", "pk"), "pk")
    ))
    assert(out.count() == 2L)
    assert(out.select("relation").as[String].collect().sorted.toSeq == Seq("r1", "r2"))
  }
}
