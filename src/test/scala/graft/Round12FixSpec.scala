package graft

import graft.text.RetrievalEval
import org.apache.spark.sql.functions._

/** Round-12 ADVICE regressions: the three fixes from the round-11
  * driver review, each pinned so the failure mode cannot silently
  * return.
  */
class Round12FixSpec extends SparkSpec {
  import spark.implicits._

  test("evaluateGraded: a qrel grade above maxGrade fails loudly, never a silent ERR drop") {
    // pre-fix: grade = 3 with maxGrade = 2 made the cascade stop-
    // probability R = 7/4 > 1, so ln(1 - R) went NULL and the window
    // sum silently dropped that term — ERR came out quietly wrong.
    val ranking = Seq(("q", "d1", 1L), ("q", "d2", 2L)).toDF("query_id", "doc_id", "rank")
    val bad = Seq(("q", "d1", 3L)).toDF("query_id", "id", "grade")
    val e = intercept[Exception] {
      RetrievalEval.evaluateGraded(ranking, bad, k = 2, maxGrade = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("exceeds maxGrade")),
      s"expected the loud grade-validation error, got: $e")
    // the boundary grade == maxGrade stays valid (R < 1 by one part in 2^g)
    val ok = Seq(("q", "d1", 2L)).toDF("query_id", "id", "grade")
    val r = RetrievalEval.evaluateGraded(ranking, ok, k = 2, maxGrade = 2).collect()(0)
    assert(r.getAs[Long]("n_judged") == 1L)
    assert(r.getAs[Double]("ndcg_graded_at_k") == 1.0)
  }

  test("missingSf100Tables: the sf100 guard requires all three scaled tables") {
    // pre-fix: the bench guarded only documents.parquet, so a stale
    // documents-only sf100 dir errored q_communities/q_meds_pipeline/
    // q_cox and exited the whole bench with rc = 1 instead of skipping
    // the section like the sf1 guard does.
    val dir = java.nio.file.Files.createTempDirectory("graft-sf100-guard")
    try {
      assert(Bench.missingSf100Tables(dir.toString) ==
        Seq("documents.parquet", "events.parquet", "lineitem.parquet"))
      java.nio.file.Files.createDirectory(dir.resolve("documents.parquet"))
      assert(Bench.missingSf100Tables(dir.toString) ==
        Seq("events.parquet", "lineitem.parquet"),
        "a documents-only dir (the round-10 layout) must NOT pass the guard")
      java.nio.file.Files.createDirectory(dir.resolve("events.parquet"))
      java.nio.file.Files.createDirectory(dir.resolve("lineitem.parquet"))
      assert(Bench.missingSf100Tables(dir.toString).isEmpty)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("mainRowCheck: a written/expected row-count mismatch is an error, not a footnote") {
    // pre-fix: runMainPipeline recorded the re-read count in the
    // artifact but never compared it, so a silent row-count regression
    // in the graft.Main path could not fail the bench.
    assert(Bench.mainRowCheck(25274600L, 25274600L).isEmpty)
    val err = Bench.mainRowCheck(25274599L, 25274600L)
    assert(err.isDefined)
    assert(err.get.contains("25274599") && err.get.contains("25274600"),
      "the error must name both counts so the artifact is self-explaining")
  }
}
