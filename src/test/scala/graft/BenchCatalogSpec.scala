package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The committed BENCH_QUERIES.json is the round's per-query perf
  * surface — a registered query with no bench number is invisible to
  * the perf gate the same way an uncatalogued query was invisible to
  * the correctness gate (round-11 verdict item 2: `q_pq_codes` and
  * `q_retrieval_eval_graded` registered after the final full run and
  * carried no numbers). This spec makes that drift a TEST FAILURE:
  * the artifact's sf0.1 "queries" key set must equal
  * `SparkEntry.queries` exactly — add a query, re-run
  * `runMain graft.Bench` (at least the "sf" section) before shipping.
  */
class BenchCatalogSpec extends AnyFunSuite {

  private def artifact(): JValue = {
    val candidates = Seq(
      new java.io.File("BENCH_QUERIES.json"),
      new java.io.File("/root/repo/BENCH_QUERIES.json"))
    val f = candidates.find(_.exists()).getOrElse(
      fail(s"BENCH_QUERIES.json not found from ${new java.io.File(".").getAbsolutePath}"))
    JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8))
  }

  test("bench artifact covers every registered query (bench cannot lag the registry)") {
    val j = artifact()
    val benched = (j \ "queries") match {
      case JObject(fields) => fields.map(_._1).toSet
      case other => fail(s"BENCH_QUERIES.json 'queries' is not an object: $other")
    }
    // budget-skipped sf0.1 queries still count as covered intent — they
    // are enumerated under skipped.sf with a reason, not silently absent
    val skipped = (j \ "skipped" \ "sf") match {
      case JObject(fields) => fields.map(_._1).toSet
      case _ => Set.empty[String]
    }
    val covered = benched ++ skipped
    val registered = SparkEntry.queries.keySet
    val missing = registered.diff(covered).toSeq.sorted
    assert(missing.isEmpty,
      s"registered queries with NO bench number: ${missing.mkString(", ")} — " +
        "re-run `runMain graft.Bench` to refresh BENCH_QUERIES.json")
    val phantom = covered.diff(registered).toSeq.sorted
    assert(phantom.isEmpty,
      s"BENCH_QUERIES.json carries unregistered queries (stale artifact): ${phantom.mkString(", ")}")
  }

  test("scaled-section subsets name only registered queries") {
    val registered = SparkEntry.queries.keySet
    for ((tag, subset) <- Seq(
        "HotQueries" -> Bench.HotQueries, "Sf10Queries" -> Bench.Sf10Queries,
        "Sf100Queries" -> Bench.Sf100Queries, "CheckpointQueries" -> Bench.CheckpointQueries)) {
      val unknown = subset.filterNot(registered.contains)
      assert(unknown.isEmpty, s"$tag names unregistered queries: ${unknown.mkString(", ")}")
      assert(subset.distinct.size == subset.size, s"$tag has duplicates")
    }
  }
}
