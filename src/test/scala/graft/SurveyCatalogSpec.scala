package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2 is the coverage contract the correctness gate reads — an
  * oracle-green query with no §2 row is invisible to it (this drifted
  * 4 operators in round 10). This spec makes the drift a TEST FAILURE:
  * every key in `SparkEntry.queries` must appear in backticks inside
  * SURVEY.md's §2 section (the operator table or the relational-bench
  * paragraph directly under it).
  */
class SurveyCatalogSpec extends AnyFunSuite {

  private def surveyText(): String = {
    val candidates = Seq(
      new java.io.File("SURVEY.md"),
      new java.io.File("/root/repo/SURVEY.md"))
    val f = candidates.find(_.exists()).getOrElse(
      fail(s"SURVEY.md not found from ${new java.io.File(".").getAbsolutePath}"))
    new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  test("every registered query has a SURVEY §2 row (catalog cannot lag the registry)") {
    val text = surveyText()
    val start = text.indexOf("## 2.")
    val end = text.indexOf("## 3.")
    assert(start >= 0 && end > start, "SURVEY.md must keep §2 and §3 headers")
    val section2 = text.substring(start, end)
    val backticked = "`([A-Za-z0-9_]+)`".r
      .findAllMatchIn(section2).map(_.group(1)).toSet
    val registered = SparkEntry.queries.keySet
    val missing = registered.diff(backticked).toSeq.sorted
    assert(missing.isEmpty,
      s"registered queries with NO SURVEY §2 row: ${missing.mkString(", ")} — " +
        "add a catalog row for each before shipping")
    // and the reverse: a §2 row claiming a query that does not exist is
    // a stale catalog entry (spec-only rows name modules, not q_ keys)
    val phantom = backticked.filter(_.startsWith("q_")).diff(registered)
      .diff(SparkEntry.oracleSql.keySet).toSeq.sorted
    assert(phantom.isEmpty,
      s"SURVEY §2 names unregistered queries: ${phantom.mkString(", ")}")
  }
}
