package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain join") {
    // heavily skewed: 90% of probe rows share one key
    val probe = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("key", "payload")
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).map(k => (k, s"meta_$k")).toDF("key", "meta")

    val plain = probe.join(dim, Seq("key"))
    val salted = Skew.saltedJoin(probe, dim, Seq("key"), salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("saltedJoin spreads a hot key across multiple salt buckets") {
    val probe = (1 to 1000).map(i => ("hot", i)).toDF("key", "payload")
    val salts = probe.withColumn(
      "__salt", pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 4) // the single key occupies most of the 8 buckets
  }

  test("left join semantics preserved under salting") {
    val probe = Seq(("a", 1), ("b", 2)).toDF("key", "payload")
    val dim = Seq(("a", "ma")).toDF("key", "meta")
    val out = Skew.saltedJoin(probe, dim, Seq("key"), salts = 4, joinType = "left")
      .as[(String, Int, Option[String])].collect().toSet
    assert(out == Set(("a", 1, Some("ma")), ("b", 2, None)))
  }
}
