package graft

import graft.operators.{Drift, FuzzyJoin}
import graft.pipeline.Selection
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Round-9 batch Q: S-stemmer, structure hashing, blocking-quality
  * audit, whole-table drift report, curriculum interleave.
  */
class Round9cOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sStem: Harman's three rules with their exceptions") {
    val words = Seq("ponies", "dogs", "classes", "glass", "bus", "goes",
      "trees", "aies", "cats", "is")
    val got = words.toDF("w").select(col("w"), TextFunctions.sStem(col("w")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("ponies") == "pony") // ies -> y
    assert(got("dogs") == "dog") // s -> ''
    assert(got("classes") == "classe") // es -> drop s only
    assert(got("glass") == "glass") // ss exception
    assert(got("bus") == "bus") // us exception
    assert(got("goes") == "goes") // oes exception
    assert(got("trees") == "trees") // ees exception
    assert(got("aies") == "aies") // aies exception
    assert(got("cats") == "cat")
    assert(got("is") == "i") // the s-rule has no length guard, by design
  }

  test("structureHash: template twins share it, content twins need not") {
    val df = Seq(
      (1L, "short line\na much longer second line here\nend"),
      (2L, "other line\nxx different longer second liner\nfin"), // same skeleton
      (3L, "one\ntwo\nthree\nfour"), // different skeleton
      (4L, null.asInstanceOf[String])
    ).toDF("id", "text").select(col("id"), TextFunctions.structureHash(col("text")).as("h"))
    val got = df.collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("h"))).toMap
    assert(got(1L) == got(2L), "same line-length skeleton -> same hash")
    assert(got(1L) != got(3L))
    assert(got(4L).isEmpty, "NULL text -> NULL hash")
  }

  test("blockingQuality: window loss measured exactly; oversized block raises") {
    // one block 'ab', 4 mutually-close names: gold C(4,2)=6; window 3
    // probes rank-distances 1-2 -> 5 candidates; the (1,4) pair is lost
    val names = Seq("abaa1", "abaa2", "abaa3", "abaa4").toDF("nm")
    val r = FuzzyJoin.blockingQuality(names, "nm", maxDist = 4, windowSize = 3)
      .collect().head
    assert(r.getAs[Long]("n_names") == 4L && r.getAs[Long]("n_blocks") == 1L)
    assert(r.getAs[Long]("n_block_pairs") == 6L)
    assert(r.getAs[Long]("n_candidates") == 5L)
    assert(r.getAs[Long]("n_gold") == 6L && r.getAs[Long]("n_covered") == 5L)
    assert(math.abs(r.getAs[Double]("pair_completeness") - 5.0 / 6.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("reduction_ratio") - 1.0 / 6.0) < 1e-6)
    val ex = intercept[Exception] {
      FuzzyJoin.blockingQuality(names, "nm", 4, windowSize = 3, maxBlockSize = 2)
        .collect()
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("quadratic"), msgs)
  }

  test("driftReport: a shifted feature outscores an identical one on both gauges") {
    val rows = (1 to 200).map { i =>
      val ref = i % 2 == 0
      // same: identical multiset in both slices (i/2 decouples the value
      // from the slice parity); moved: +50 in the current slice
      val v = (i / 2) % 10 * 1.0
      (ref, v, if (ref) v else v + 50.0)
    }
    val df = rows.toDF("ref", "same", "moved")
    val got = Drift.driftReport(df, Seq("same", "moved"), col("ref"))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(got("same").getAs[Long]("n_ref") == 100L && got("same").getAs[Long]("n_cur") == 100L)
    assert(got("same").getAs[Double]("d") == 0.0)
    assert(got("moved").getAs[Double]("d") == 1.0, "disjoint supports -> KS D = 1")
    assert(got("moved").getAs[Double]("psi") > got("same").getAs[Double]("psi") + 1.0)
  }

  test("Graph.profile: counts, multiplicity, reciprocity, degree extremes") {
    val e = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("a", "c")).toDF("src", "dst")
    val r = graft.operators.Graph.profile(e).collect().head
    assert(r.getAs[Long]("n_nodes") == 3L)
    assert(r.getAs[Long]("n_edges") == 4L && r.getAs[Long]("n_edges_distinct") == 3L)
    assert(r.getAs[Long]("max_out_deg") == 3L)
    assert(r.getAs[Double]("avg_out_deg") == 2.0) // 4 edges over 2 sources
    assert(math.abs(r.getAs[Double]("reciprocity") - 2.0 / 3.0) < 1e-6)
  }

  test("featureAucScreen: a leaking feature saturates separation in either direction") {
    val df = (1 to 10).map(i => (i > 5, i * 1.0, (10 - i) * 1.0, 7.0))
      .toDF("y", "leak", "antileak", "flat")
    val got = Drift.featureAucScreen(df, Seq("leak", "antileak", "flat"), col("y"))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(got("leak").getAs[Double]("auc") == 1.0)
    assert(got("antileak").getAs[Double]("auc") == 0.0)
    assert(got("leak").getAs[Double]("separation") == 1.0)
    assert(got("antileak").getAs[Double]("separation") == 1.0,
      "an inverted leak separates just as perfectly")
    assert(got("flat").getAs[Double]("auc") == 0.5, "a constant feature is a coin flip")
  }

  test("rendezvous hashing: movers only ever move TO a new shard (minimal movement)") {
    import graft.operators.Shard
    val keys = (1L to 500L).toDF("k")
    val a = Shard.rendezvousAssign(
      Shard.rendezvousAssign(keys, "k", 8, "s", "from8"), "k", 10, "s", "to10")
    val rows = a.collect()
    assert(rows.forall(r => r.getAs[Long]("from8") >= 0 && r.getAs[Long]("from8") < 8))
    assert(rows.forall(r => r.getAs[Long]("to10") >= 0 && r.getAs[Long]("to10") < 10))
    val movers = rows.filter(r => r.getAs[Long]("from8") != r.getAs[Long]("to10"))
    assert(movers.forall(_.getAs[Long]("to10") >= 8),
      "a rendezvous key only relocates when a NEW shard out-weighs every old one")
    val audit = Shard.rendezvousRebalanceAudit(keys, "k", 8, 10, "s").collect().head
    assert(audit.getAs[Long]("n_moved") == movers.length.toLong)
    assert(audit.getAs[Double]("expected_frac") == 0.2)
    val frac = audit.getAs[Double]("moved_frac")
    assert(frac > 0.1 && frac < 0.3, s"~1/5 of 500 keys should move, got $frac")
  }

  test("expansionTerms: co-occurring vocabulary surfaces, query terms never do") {
    import graft.text.Bm25
    val docs = Seq(
      (1L, "spark aaa aaa"), // aaa weight 2/3
      (2L, "spark bbb"), // bbb weight 1/2
      (3L, "ccc ccc ccc") // no query term: not a feedback doc
    ).toDF("doc_id", "text")
    val got = Bm25.expansionTerms(docs, Seq("spark"), fbDocs = 5, fbTerms = 5)
      .collect().map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("weight"))).toMap
    assert(!got.contains("spark"), "original query terms are excluded")
    assert(!got.contains("ccc"), "non-feedback docs contribute nothing")
    assert(got("aaa") == ((1L, 0.666667)))
    assert(got("bbb") == ((1L, 0.5)))
  }

  test("curriculumInterleave: easy-first within groups, round-robin across them") {
    val df = Seq(
      (1L, "a", 3.0), (2L, "a", 1.0), (3L, "a", 2.0),
      (4L, "b", 20.0), (5L, "b", 10.0)
    ).toDF("id", "g", "s")
    val got = Selection.curriculumInterleave(df, "g", "s", "id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("global_pos")).toMap
    // a-ranks by score: id2(1.0)->r0, id3(2.0)->r1, id1(3.0)->r2; gi(a)=0, gi(b)=1
    assert(got == Map(2L -> 0L, 5L -> 1L, 3L -> 2L, 4L -> 3L, 1L -> 4L))
    // global order sorts strictly: positions are unique
    assert(got.values.toSeq.distinct.size == 5)
  }
}
