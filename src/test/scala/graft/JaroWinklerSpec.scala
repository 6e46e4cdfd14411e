package graft

import graft.functions.JaroWinkler
import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches the reference values (DuckDB jaro_winkler_similarity convention)") {
    val cases = Seq(
      ("martha", "marhta") -> 0.9611111111111111,
      ("DIXON", "DICKSONX") -> 0.8133333333333332,
      ("JELLYFISH", "SMELLYFISH") -> 0.8962962962962964,
      ("", "x") -> 0.0,
      ("", "") -> 0.0, // DuckDB convention: empty -> 0, not 1
      ("abc", "abc") -> 1.0,
      ("ab", "ba") -> 0.0, // window 0: no matches
      ("CRATE", "TRACE") -> 0.7333333333333334,
      ("arnab", "aranb") -> 0.9466666666666665,
      ("aaaaaa", "aaaaab") -> 0.9333333333333333, // prefix capped at 4
      ("aaxxxxxx", "aayyyyyy") -> 0.5,            // jaro <= 0.7: no boost
      ("abcdxxxx", "abcdyyyy") -> 0.6666666666666666,
      ("ab", "abcdefghij") -> 0.7866666666666667
    )
    for (((a, b), expected) <- cases)
      assert(math.abs(jw(a, b) - expected) < 1e-12, s"jw($a, $b)")
  }

  test("symmetric, and 1.0 iff equal non-empty") {
    for ((a, b) <- Seq(("kitten", "sitting"), ("alpha", "alphabet"), ("x", "y")))
      assert(jw(a, b) == jw(b, a))
    assert(jw("same", "same") == 1.0)
  }

  test("codegen path matches interpreted eval, null propagates") {
    // the SQL registration itself is covered in DotProductSpec's
    // GraftExtensions session test
    val df = Seq(("martha", "marhta"), ("CRATE", "TRACE")).toDF("a", "b")
    val viaColumn = df.select(JaroWinkler.jaroWinkler(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(viaColumn.toSeq == Seq(0.9611111111111111, 0.7333333333333334))
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b"))).head()
    assert(n.isNullAt(0))
  }

  test("fuzzyPairsJaroWinkler scores only blocked candidates") {
    val df = Seq("acme corp", "acme corpp", "zzz unrelated").toDF("name")
    val out = FuzzyJoin.fuzzyPairsJaroWinkler(df, "name", minSim = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("acme corp", "acme corpp")))
  }
}
