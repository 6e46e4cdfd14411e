package graft

import graft.pipeline.CorpusReport
import graft.text.{Cooccurrence, SpanCorrupt}
import org.apache.spark.sql.functions._

/** Round-5 batch: skip-gram co-occurrence, span corruption, corpus report. */
class Round5gOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- cooccurrence

  test("skipgramCounts: window-2 pairs, canonical order, minCount prune") {
    val df = Seq.fill(3)("a b c a").toDF("text") // x3 so pairs clear minCount=3
    val out = Cooccurrence.skipgramCounts(df, window = 2, minCount = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    // per doc: (a,b) adj, (a,c) skip, (b,c) adj, (a,b) skip[b->a], (a,c) adj[c->a]
    assert(out(("a", "b")) == 6L, s"a-b twice per doc: $out")
    assert(out(("a", "c")) == 6L, s"a-c twice per doc (skip + adjacent): $out")
    assert(out(("b", "c")) == 3L)
    assert(out.size == 3)
  }

  test("skipgramCounts: window 1 reduces to adjacent bigrams") {
    val df = Seq.fill(3)("x y z").toDF("text")
    val out = Cooccurrence.skipgramCounts(df, window = 1, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("x", "y"), ("y", "z")), s"no skip pairs at window 1: $out")
  }

  // -------------------------------------------------------- span corruption

  test("corruptionStats: masks are deterministic, spans merge, fingerprint reconstructs") {
    val words = (1 to 60).map(i => ('a' + (i * 7) % 26).toChar.toString * 2).mkString(" ")
    val df = Seq((42L, words)).toDF("doc_id", "text")
    val r = SpanCorrupt.corruptionStats(df, spanLen = 3, rate = 8).collect()(0)
    val r2 = SpanCorrupt.corruptionStats(df, spanLen = 3, rate = 8).collect()(0)
    assert(r.getAs[String]("corrupt_fp") == r2.getAs[String]("corrupt_fp"), "deterministic")
    val (n, m, s2) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_masked"), r.getAs[Long]("n_spans"))
    assert(n == 60L)
    assert(m > 0L, "rate 8 over 60 tokens should mask something")
    assert(s2 <= m && m <= s2 * 3, "each span covers 1..3 masked tokens after merging")
    // reconstruct by hand from the same hash recipe
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 8), 16)
    }
    val toks = words.split(" ")
    val starts = (1 to 60).map(i => h32(s"42:$i") % 8 == 0)
    val masked = (1 to 60).map(i =>
      starts(i - 1) || (i > 1 && starts(i - 2)) || (i > 2 && starts(i - 3)))
    assert(m == masked.count(identity))
    val kept = (1 to 60).flatMap { i =>
      if (!masked(i - 1)) Some(toks(i - 1))
      else if (i == 1 || !masked(i - 2)) Some("<mask>")
      else None
    }
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(kept.mkString(" ").getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("corrupt_fp") == fp, "fingerprint matches the hand fold")
  }

  test("corruptionStats: empty and tiny docs degrade cleanly") {
    val df = Seq((1L, ""), (2L, "one")).toDF("doc_id", "text")
    val out = SpanCorrupt.corruptionStats(df).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_tokens")).toMap
    assert(out(1L) == 0L && out(2L) == 1L)
  }

  // -------------------------------------------------------- corpus report

  test("report: per-source volume, quality, language entropy, and dup rate") {
    val en = "the cat is in the hat and that is that for now it is done and good. " * 3
    val es = "el la de que y en los del se por el la de que y en los del se por. " * 3
    val df = Seq(
      (1L, en, "a"), (2L, en + "extra tail words here", "a"), (3L, es, "a"),
      (4L, en, "b"), // exact dup of doc 1 -> corpus-wide victim in source b
      (5L, es + "unique", "b")
    ).toDF("doc_id", "text", "source")
    val out = CorpusReport.report(df)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("lang_entropy"), r.getAs[Double]("dup_rate"))))
      .toMap
    assert(out("a")._1 == 3L && out("b")._1 == 2L)
    // source a: 2 en + 1 es -> H = ln3 - (2 ln2)/3
    val ha = math.log(3) - 2 * math.log(2) / 3
    assert(math.abs(out("a")._2 - ha) < 1e-9, s"entropy: ${out("a")._2} vs $ha")
    // doc 4 duplicates doc 1 (first occurrence is in source a)
    assert(out("b")._3 == 0.5 && out("a")._3 == 0.0)
  }

  // ------------------------------------------------------ retrieval eval

  test("retrieval eval: hand-computed MRR/recall/nDCG on a tiny qrel set") {
    import graft.text.RetrievalEval
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha only here"),
      (3L, "beta alpha repeated beta"), (4L, "nothing at all"),
      (5L, "alpha beta")).toDF("doc_id", "text")
    val rel = RetrievalEval.containsAllRelevance(docs, Seq("q" -> Seq("alpha", "beta")))
    assert(rel.collect().map(_.getAs[Long]("id")).toSet == Set(1L, 3L, 5L))
    // a deliberately imperfect ranking: rank 1 relevant, ranks 2-3 not
    val ranking = Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 4L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val m = RetrievalEval.evaluate(ranking, rel, k = 3).collect()(0)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(m.getAs[Long]("n_relevant") == 3L)
    assert(m.getAs[Double]("mrr") == 1.0)
    assert(math.abs(m.getAs[Double]("recall_at_k") - 1.0 / 3.0) < 1e-9)
    val idcg = r6(1.0) + r6(1.0 / (math.log(3) / math.log(2))) + r6(0.5)
    assert(math.abs(m.getAs[Double]("ndcg_at_k") - 1.0 / idcg) < 1e-9)
  }

  test("retrieval eval: a query with nothing findable scores 0, not NULL") {
    import graft.text.RetrievalEval
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val rel = RetrievalEval.containsAllRelevance(docs, Seq("z" -> Seq("zzz")))
    val ranking = Seq(("z", 1L, 1L)).toDF("query_id", "doc_id", "rank")
    val m = RetrievalEval.evaluate(ranking, rel, k = 3).collect()(0)
    assert(m.getAs[Long]("n_relevant") == 0L)
    assert(m.getAs[Double]("mrr") == 0.0)
    assert(m.getAs[Double]("recall_at_k") == 0.0 && m.getAs[Double]("ndcg_at_k") == 0.0)
  }
}
